# ModelNet40 classification with TTA voting
# (parity: reference voting testers, e.g. cls-ptv3 + ClsVotingTester)
_base_ = ["./cls-pt-v3m1-0-base.py"]

test = dict(type="ClsVotingTester", num_repeat=100)

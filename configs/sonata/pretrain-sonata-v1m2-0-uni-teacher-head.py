# Sonata v1m2: unified teacher head (single head serves mask+unmask streams)
# (parity: reference configs/sonata/pretrain-sonata-v1m2-0-uni-teacher-head.py)
_base_ = ["./pretrain-sonata-v1m1-0-base.py"]

model = dict(type="Sonata-v1m2")

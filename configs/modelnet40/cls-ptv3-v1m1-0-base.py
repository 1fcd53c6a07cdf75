# PTv3 ModelNet40 classification (reference's alternate file name for the ptv3 cls recipe)
# (parity: reference configs/modelnet40/cls-ptv3-v1m1-0-base.py)
_base_ = ["./cls-pt-v3m1-0-base.py"]

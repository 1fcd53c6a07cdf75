# PPT-pretrained PointGroup on S3DIS at 0.05 m voxel size
# (parity: reference configs/s3dis/insseg-ppt-v1m1-0-pointgroup-spunet-ft-vs0p05.py)
_base_ = ["./insseg-ppt-v1m1-0-pointgroup-spunet-ft.py"]

grid_size = 0.05

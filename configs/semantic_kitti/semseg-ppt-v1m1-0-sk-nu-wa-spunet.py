# PPT joint outdoor training (SemanticKITTI + nuScenes + Waymo), language-conditioned SpUNet
# (parity: reference configs/semantic_kitti/semseg-ppt-v1m1-0-sk-nu-wa-spunet.py)
_base_ = ["../scannet/semseg-ppt-v1m1-0-sc-st-spunet.py"]

model = dict(
    backbone=dict(
        in_channels=4,
        conditions=("SemanticKITTI", "nuScenes", "Waymo"),
    ),
    conditions=("SemanticKITTI", "nuScenes", "Waymo"),
    # fmt: off
    class_name=(
        "car", "bicycle", "motorcycle", "truck", "other-vehicle", "person", "bicyclist", "motorcyclist",
        "road", "parking", "sidewalk", "other-ground", "building", "fence", "vegetation", "trunk",
        "terrain", "pole", "traffic-sign", "barrier", "bus", "construction_vehicle", "pedestrian",
        "traffic_cone", "trailer", "driveable_surface", "other_flat", "manmade", "bird", "ground_animal",
        "cyclist", "motorcyclist_w", "sign", "traffic_light", "lane_marker", "other_vehicle_w", "tree_trunk", "walkable",
    ),
    valid_index=(
        (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18),
        (19, 1, 20, 0, 21, 2, 22, 23, 25, 24, 3, 26, 27, 10, 28, 14),
        (0, 3, 20, 36, 31, 32, 5, 33, 34, 17, 35, 13, 8, 29, 37, 10, 9, 14, 11, 12, 30, 16),
    ),
    # fmt: on
)

data = dict(
    train=dict(loop=1),
)

# --- training schedule: extracted from the reference config of the same
# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---
epoch = 50
eval_epoch = 50
optimizer = dict(_delete_=True, lr=0.002, type='AdamW', weight_decay=0.005)
scheduler = dict(_delete_=True, anneal_strategy='cos', div_factor=10.0, final_div_factor=100.0, max_lr=0.002, pct_start=0.04, type='OneCycleLR')
param_dicts = None

"""Emit the mechanical config-corpus families (SSL probe suites + one-off
variants) so the corpus matches the reference's config inventory file-by-file.

Dev tool: run once from the repo root; files it writes are committed. Every
emitted config chains off a hand-written anchor (the family's scannet lin
probe, a dataset base, etc.) so the per-file delta stays small and readable.
Model/data topology mirrors the reference configs of the same name (see each
file's parity line). Training schedules (epoch/lr/wd/param_dicts) are injected
from `tools/ref_schedules.json` — values extracted from the reference's own
resolved configs by tools/extract_ref_schedules.py — for every file whose
relpath exists in the reference; files without a reference counterpart keep
the family recipe's simplified schedule. The corpus test
(tests/test_configs_corpus.py) checks that every file parses and resolves its
registry types.
"""

import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FILES = {}


def emit(path, text):
    assert path not in FILES, path
    FILES[path] = text.strip() + "\n"


# ---------------------------------------------------------------- datasets
# indoor datasets chain probe data off the family's scannet lin anchor
INDOOR = {
    "scannet200": dict(
        nc=200,
        data="""
data = dict(
    num_classes=200,
    names=[f"class_{i}" for i in range(200)],
    train=dict(type="ScanNet200Dataset"),
    val=dict(type="ScanNet200Dataset"),
    test=dict(type="ScanNet200Dataset"),
)
""",
    ),
    "scannetpp": dict(
        nc=100,
        data="""
data = dict(
    num_classes=100,
    names=[f"class_{i}" for i in range(100)],
    train=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    val=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    test=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
)
""",
    ),
    "s3dis": dict(
        nc=13,
        extra="point_capacity = 262144\npoint_capacity_val = 262144\n",
        data="""
dataset_type = "S3DISDataset"
data_root = "data/s3dis"

data = dict(
    num_classes=13,
    names=[
        "ceiling", "floor", "wall", "beam", "column", "window", "door",
        "table", "chair", "sofa", "bookcase", "board", "clutter",
    ],
    train=dict(type=dataset_type, data_root=data_root, split=("Area_1", "Area_2", "Area_3", "Area_4", "Area_6")),
    val=dict(type=dataset_type, data_root=data_root, split="Area_5"),
    test=dict(type=dataset_type, data_root=data_root, split="Area_5"),
)
""",
    ),
    "aeo": dict(
        nc=16,
        data="""
data = dict(
    num_classes=16,
    names=[f"class_{i}" for i in range(16)],
    train=dict(type="AEODataset", data_root="data/aeo_semi"),
    val=dict(type="AEODataset", data_root="data/aeo_semi"),
    test=dict(type="AEODataset", data_root="data/aeo_semi"),
)
""",
    ),
}

# outdoor probes restate the frozen-probe model over the dataset's own base;
# SSL backbones are pretrained with in_channels=9, so outdoor probes read the
# ColorNormal dataset variants (estimated color/normal features)
OUTDOOR = {
    "nuscenes": dict(nc=16, base="../nuscenes/semseg-pt-v3m1-0-base.py", cn="NuScenesColorNormalDataset"),
    "waymo": dict(nc=22, base="../waymo/semseg-pt-v3m1-0-base.py", cn="WaymoColorNormalDataset"),
    "kitti": dict(nc=19, base="../semantic_kitti/semseg-pt-v3m1-0-base.py", cn="SemanticKITTIColorNormalDataset"),
}

# family backbones: (model type, enc dims dict text, lin concat width)
SONATA_BB = """dict(
        type="PT-v3m2",
        in_channels={inc},
        order=("z", "z-trans", "hilbert", "hilbert-trans"),
        stride=(2, 2, 2, 2),
        enc_depths=(3, 3, 3, 12, 3),
        enc_channels=(48, 96, 192, 384, 512),
        enc_num_head=(3, 6, 12, 24, 32),
        enc_patch_size=(1024, 1024, 1024, 1024, 1024),
        mlp_ratio=4,
        enable_flash=True,
        enc_mode={enc_mode},
        serialize_depth=11,
        grid_size=0.02,{extra}
    )"""

UTONIA_BB = """dict(
        type="PT-v3m3",
        in_channels={inc},
        order=("z", "z-trans", "hilbert", "hilbert-trans"),
        stride=(2, 2, 2, 2),
        enc_depths=(3, 3, 3, 12, 3),
        enc_channels=(54, 108, 216, 432, 576),
        enc_num_head=(3, 6, 12, 24, 32),
        enc_patch_size=(1024, 1024, 1024, 1024, 1024),
        mlp_ratio=4,
        enable_flash=True,
        enc_mode={enc_mode},
        mask_token=True,
        rope_base=10.0,
        serialize_depth=11,
        grid_size=0.02,{extra}
    )"""

CONCERTO_LARGE_BB = """dict(
        type="PT-v3m2",
        in_channels={inc},
        order=("z", "z-trans", "hilbert", "hilbert-trans"),
        stride=(2, 2, 2, 2),
        enc_depths=(3, 3, 3, 12, 3),
        enc_channels=(64, 128, 256, 512, 768),
        enc_num_head=(4, 8, 16, 32, 48),
        enc_patch_size=(1024, 1024, 1024, 1024, 1024),
        mlp_ratio=4,
        enable_flash=True,
        enc_mode={enc_mode},
        serialize_depth=11,
        grid_size=0.02,{extra}
    )"""

SONATA_DEC = """
    backbone=dict(
        enc_mode=False,
        dec_depths=(3, 3, 3, 3),
        dec_channels=(64, 96, 192, 384),
        dec_num_head=(4, 6, 12, 24),
        dec_patch_size=(1024, 1024, 1024, 1024),
    ),"""

UTONIA_DEC = """
    backbone=dict(
        enc_mode=False,
        dec_depths=(2, 2, 2, 2),
        dec_channels=(54, 108, 216, 432),
        dec_num_head=(3, 6, 12, 24),
        dec_patch_size=(1024, 1024, 1024, 1024),
    ),"""

CONCERTO_DEC = """
    backbone=dict(
        enc_mode=False,
        dec_depths=(3, 3, 3, 3),
        dec_channels=(64, 128, 256, 512),
        dec_num_head=(4, 8, 16, 32),
        dec_patch_size=(1024, 1024, 1024, 1024),
    ),"""

FAMS = {
    "sonata": dict(
        prefix="semseg-sonata-v1m1", width=1328, dec_width=64, bb=SONATA_BB, dec=SONATA_DEC,
        ckpt="student.backbone.",
    ),
    "utonia": dict(
        prefix="semseg-utonia-v1m1", width=1386, dec_width=54, bb=UTONIA_BB, dec=UTONIA_DEC,
        ckpt="student.backbone.",
    ),
    "concerto-large": dict(
        prefix="semseg-ptv3-large-v1m1", width=1728, dec_width=64, bb=CONCERTO_LARGE_BB,
        dec=CONCERTO_DEC, ckpt="student.backbone.", dir="concerto",
    ),
    "concerto-base": dict(
        prefix="semseg-ptv3-base-v1m1", width=1328, dec_width=64, bb=SONATA_BB, dec=SONATA_DEC,
        ckpt="student.backbone.", dir="concerto",
    ),
}


def header(fam_dir, name, desc):
    return f"# {desc}\n# (parity: reference configs/{fam_dir}/{name})\n"


def lin_anchor_ref(fam, ds_tag):
    """Path of the family's lin probe for dataset tag (relative to fam dir)."""
    return f"./{FAMS[fam]['prefix']}-{ds_tag}-lin.py"


def emit_semseg_family(fam, plan):
    """plan: list of (index_tag, ds, kind) e.g. ("1a", "scannet200", "lin")."""
    f = FAMS[fam]
    fam_dir = f.get("dir", fam)
    for tag, ds, kind in plan:
        name = f"{f['prefix']}-{tag}-{ds}-{kind}.py"
        path = f"configs/{fam_dir}/{name}"
        scannet_lin = lin_anchor_ref(fam, "0a-scannet")
        ds_lin = lin_anchor_ref(fam, f"{tag[:-1]}a-{ds}")
        if kind == "lin" and ds in INDOOR:
            d = INDOOR[ds]
            body = f"_base_ = [\"{scannet_lin}\"]\n\n"
            body += d.get("extra", "")
            body += f"model = dict(num_classes={d['nc']})\n"
            body += d["data"]
            emit(path, header(fam_dir, name, f"{fam} linear probing on {ds}") + body)
        elif kind == "lin" and ds in OUTDOOR:
            d = OUTDOOR[ds]
            bb = f["bb"].format(inc=9, enc_mode=True, extra="")
            body = f"""_base_ = ["{d['base']}"]

model = dict(
    _delete_=True,
    type="DefaultSegmentorV2",
    num_classes={d['nc']},
    backbone_out_channels={f['width']},
    freeze_backbone=True,
    backbone={bb},
    up_cast_level=0,
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

data = dict(
    train=dict(type="{d['cn']}"),
    val=dict(type="{d['cn']}"),
    test=dict(type="{d['cn']}"),
)

epoch = 100
eval_epoch = 100
optimizer = dict(_delete_=True, type="AdamW", lr=0.001, weight_decay=0.0)
scheduler = dict(
    _delete_=True,
    type="OneCycleLR",
    max_lr=0.001,
    pct_start=0.05,
    anneal_strategy="cos",
    div_factor=10.0,
    final_div_factor=1000.0,
)
param_dicts = None

hooks = [
    dict(type="CheckpointLoader", keywords="{f['ckpt']}", replacement="backbone."),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver", save_freq=None),
]
"""
            emit(path, header(fam_dir, name, f"{fam} linear probing on {ds} (outdoor, geometry-only features)") + body)
        elif kind == "dec":
            body = f"""_base_ = ["{ds_lin}"]

model = dict(
    backbone_out_channels={f['dec_width']},{f['dec']}
    up_cast_level=0,
    freeze_backbone=False,  # decoder is fresh; encoder frozen via lr=0 group
)

param_dicts = [dict(keyword="enc", lr=0.0)]
"""
            emit(path, header(fam_dir, name, f"{fam} decoder probing on {ds}: frozen encoder + light decoder") + body)
        elif kind == "ft":
            body = f"""_base_ = ["{ds_lin}"]

model = dict(
    freeze_backbone=False,
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0, ignore_index=-1),
    ],
)

epoch = 800
eval_epoch = 100
optimizer = dict(lr=0.006, weight_decay=0.05)
scheduler = dict(max_lr=[0.006, 0.0006])
param_dicts = [dict(keyword="block", lr=0.0006)]
"""
            emit(path, header(fam_dir, name, f"{fam} full fine-tune on {ds}") + body)
        elif kind == "ppt":
            # prompt-tuned fine-tune: language-conditioned PPT head over the
            # pretrained backbone (reference sonata/concerto "*-ppt" probes)
            bb = f["bb"].format(inc=6, enc_mode=False, extra=SONATA_DEC_INLINE[fam])
            body = f"""_base_ = ["{ds_lin}"]

model = dict(
    _delete_=True,
    type="PPT-v1m3",
    backbone={bb},
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0, ignore_index=-1),
    ],
    freeze_backbone=False,
    backbone_out_channels={f['dec_width']},
)

epoch = 800
eval_epoch = 100
optimizer = dict(_delete_=True, type="AdamW", lr=0.006, weight_decay=0.05)
scheduler = dict(
    _delete_=True,
    type="OneCycleLR",
    max_lr=[0.006, 0.0006],
    pct_start=0.05,
    anneal_strategy="cos",
    div_factor=10.0,
    final_div_factor=1000.0,
)
param_dicts = [dict(keyword="block", lr=0.0006)]
"""
            emit(path, header(fam_dir, name, f"{fam} prompt-tuned (PPT head) fine-tune on {ds}") + body)
        else:
            raise ValueError(kind)


# inline decoder fields appended inside the backbone dict for ppt probes
SONATA_DEC_INLINE = {
    "sonata": """
        dec_depths=(3, 3, 3, 3),
        dec_channels=(64, 96, 192, 384),
        dec_num_head=(4, 6, 12, 24),
        dec_patch_size=(1024, 1024, 1024, 1024),""",
    "utonia": """
        dec_depths=(2, 2, 2, 2),
        dec_channels=(54, 108, 216, 432),
        dec_num_head=(3, 6, 12, 24),
        dec_patch_size=(1024, 1024, 1024, 1024),""",
    "concerto-large": """
        dec_depths=(3, 3, 3, 3),
        dec_channels=(64, 128, 256, 512),
        dec_num_head=(4, 8, 16, 32),
        dec_patch_size=(1024, 1024, 1024, 1024),""",
    "concerto-base": """
        dec_depths=(3, 3, 3, 3),
        dec_channels=(64, 96, 192, 384),
        dec_num_head=(4, 6, 12, 24),
        dec_patch_size=(1024, 1024, 1024, 1024),""",
}


def emit_submit(fam, tag, ds, chain_kind, splits):
    f = FAMS[fam]
    fam_dir = f.get("dir", fam)
    name = f"{f['prefix']}-{tag}-{ds}-{chain_kind}-submit.py"
    chain = f"./{f['prefix']}-{CHAIN_OF_SUBMIT[(fam, tag, ds, chain_kind)]}-{ds}-{chain_kind}.py"
    body = f"""_base_ = ["{chain}"]

evaluate = False

data = dict(
    train=dict(split={splits!r}),
    test=dict(split="test"),
)
"""
    emit(
        f"configs/{fam_dir}/{name}",
        header(fam_dir, name, f"{fam} {chain_kind} benchmark submission on {ds} (train+val, no eval)") + body,
    )


CHAIN_OF_SUBMIT = {
    ("sonata", "2e", "scannetpp", "ft"): "2c",
    ("sonata", "2f", "scannetpp", "ppt"): "2d",
    ("concerto-large", "2e", "scannetpp", "ft"): "2c",
    ("concerto-large", "2f", "scannetpp", "ppt"): "2d",
}


def emit_la_lr(fam, base_tag, ds, chain_kind, series, lora=False):
    """Data-efficient fine-tune series (limited annotation / reconstruction)."""
    f = FAMS[fam]
    fam_dir = f.get("dir", fam)
    for i, (sub, key, val) in enumerate(series):
        suffix = f"ft-lora-{sub}" if lora else f"ft-{sub}"
        name = f"{f['prefix']}-{base_tag}{i + (8 if lora else 0)}-{ds}-{suffix}.py"
        chain = f"./{f['prefix']}-{'0f' if lora else '0c'}-{ds}-{'ft-lora' if lora else 'ft'}.py"
        body = f"""_base_ = ["{chain}"]

data = dict(
    train=dict(
        {key}="{val}",
        ignore_index=-1,
    ),
)
"""
        emit(
            f"configs/{fam_dir}/{name}",
            header(fam_dir, name, f"{fam} data-efficient fine-tune on {ds} ({sub})") + body,
        )


LA_LR_SERIES = [
    ("la20", "la_file", "data/scannet/tasks/points/points20"),
    ("la50", "la_file", "data/scannet/tasks/points/points50"),
    ("la100", "la_file", "data/scannet/tasks/points/points100"),
    ("la200", "la_file", "data/scannet/tasks/points/points200"),
    ("lr1", "lr_file", "data/scannet/tasks/scenes/1.txt"),
    ("lr5", "lr_file", "data/scannet/tasks/scenes/5.txt"),
    ("lr10", "lr_file", "data/scannet/tasks/scenes/10.txt"),
    ("lr20", "lr_file", "data/scannet/tasks/scenes/20.txt"),
]


def emit_insseg_family(fam, label, plan):
    """PointGroup instance-seg probes over the SSL-pretrained backbone."""
    f = FAMS[fam]
    fam_dir = f.get("dir", fam)
    for tag, ds, kind in plan:
        name = f"insseg-{label}-{tag}-{ds}-pg-{kind}.py"
        path = f"configs/{fam_dir}/{name}"
        if ds == "scannet" and kind == "lin":
            bb = f["bb"].format(inc=6, enc_mode=False, extra=SONATA_DEC_INLINE[fam])
            bb_del = bb.replace("dict(\n", "dict(\n        _delete_=True,\n", 1)
            body = f"""_base_ = ["../scannet/insseg-pointgroup-v1m1-0-spunet-base.py"]

model = dict(
    type="PG-v1m2",
    semantic_num_classes=20,
    backbone_out_channels={f['dec_width']},
    freeze_backbone=True,
    backbone={bb_del},
)

epoch = 800
optimizer = dict(_delete_=True, type="AdamW", lr=0.002, weight_decay=0.05)
scheduler = dict(
    _delete_=True,
    type="OneCycleLR",
    max_lr=0.002,
    pct_start=0.05,
    anneal_strategy="cos",
    div_factor=10.0,
    final_div_factor=1000.0,
)

hooks = [
    dict(type="CheckpointLoader", keywords="{f['ckpt']}", replacement="backbone."),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="InsSegEvaluator", segment_ignore_index=(-1, 0, 1), instance_ignore_index=-1),
    dict(type="CheckpointSaver", save_freq=None),
]
"""
            emit(path, header(fam_dir, name, f"{fam} PointGroup insseg linear probe on {ds}") + body)
        elif kind == "lin":
            d = INDOOR[ds]
            anchor = f"./insseg-{label}-0a-scannet-pg-lin.py"
            body = f"_base_ = [\"{anchor}\"]\n\n"
            body += d.get("extra", "")
            body += f"model = dict(semantic_num_classes={d['nc']})\n"
            body += d["data"]
            emit(path, header(fam_dir, name, f"{fam} PointGroup insseg linear probe on {ds}") + body)
        elif kind == "dec":
            anchor = f"./insseg-{label}-{tag[:-1]}a-{ds}-pg-lin.py"
            body = f"""_base_ = ["{anchor}"]

model = dict(freeze_backbone=False)
param_dicts = [dict(keyword="enc", lr=0.0)]
"""
            emit(path, header(fam_dir, name, f"{fam} PointGroup insseg decoder probe on {ds}") + body)
        elif kind == "ft":
            anchor = f"./insseg-{label}-{tag[:-1]}a-{ds}-pg-lin.py"
            body = f"""_base_ = ["{anchor}"]

model = dict(freeze_backbone=False)
optimizer = dict(lr=0.006, weight_decay=0.05)
scheduler = dict(max_lr=[0.006, 0.0006])
param_dicts = [dict(keyword="block", lr=0.0006)]
"""
            emit(path, header(fam_dir, name, f"{fam} PointGroup insseg full fine-tune on {ds}") + body)


# ======================================================================
# SONATA
# ======================================================================
emit_semseg_family(
    "sonata",
    [
        ("0d", "scannet", "ppt"),
        ("1b", "scannet200", "dec"),
        ("1c", "scannet200", "ft"),
        ("1d", "scannet200", "ppt"),
        ("2a", "scannetpp", "lin"),
        ("2b", "scannetpp", "dec"),
        ("2c", "scannetpp", "ft"),
        ("2d", "scannetpp", "ppt"),
        ("3b", "s3dis", "dec"),
        ("3d", "s3dis", "ppt"),
        ("4a", "aeo", "lin"),
        ("4c", "aeo", "ft"),
    ],
)
emit_submit("sonata", "2e", "scannetpp", "ft", ("train", "val"))
emit_submit("sonata", "2f", "scannetpp", "ppt", ("train", "val"))
for i, (sub, key, val) in enumerate(LA_LR_SERIES):
    name = f"semseg-sonata-v1m1-0e{i}-scannet-ft-{sub}.py"
    body = f"""_base_ = ["./semseg-sonata-v1m1-0c-scannet-ft.py"]

data = dict(
    train=dict(
        {key}="{val}",
        ignore_index=-1,
    ),
)
"""
    emit(f"configs/sonata/{name}", header("sonata", name, f"Sonata data-efficient fine-tune on ScanNet ({sub})") + body)
emit_insseg_family(
    "sonata",
    "sonata-v1m1",
    [(t, d, k) for t, d in [("0", "scannet"), ("1", "scannet200"), ("2", "scannetpp"), ("3", "s3dis")]
     for t, d, k in [(t + "a", d, "lin"), (t + "b", d, "dec"), (t + "c", d, "ft")]],
)
emit(
    "configs/sonata/pretrain-sonata-v1m2-0-uni-teacher-head.py",
    header("sonata", "pretrain-sonata-v1m2-0-uni-teacher-head.py",
           "Sonata v1m2: unified teacher head (single head serves mask+unmask streams)")
    + """_base_ = ["./pretrain-sonata-v1m1-0-base.py"]

model = dict(type="Sonata-v1m2")
""",
)

# ======================================================================
# UTONIA
# ======================================================================
emit_semseg_family(
    "utonia",
    [
        ("0b", "scannet", "dec"),
        ("1a", "scannet200", "lin"),
        ("1b", "scannet200", "dec"),
        ("1c", "scannet200", "ft"),
        ("2a", "scannetpp", "lin"),
        ("2b", "scannetpp", "dec"),
        ("2c", "scannetpp", "ft"),
        ("3a", "s3dis", "lin"),
        ("3b", "s3dis", "dec"),
        ("3c", "s3dis", "ft"),
        ("4a", "nuscenes", "lin"),
        ("4b", "nuscenes", "dec"),
        ("4c", "nuscenes", "ft"),
        ("5a", "waymo", "lin"),
        ("5b", "waymo", "dec"),
        ("5c", "waymo", "ft"),
        ("6a", "kitti", "lin"),
        ("6b", "kitti", "dec"),
        ("6c", "kitti", "ft"),
    ],
)

# nocolor / nonormal ablations: feature channels are zeroed at load time so the
# pretrained in_channels=9 stem still applies (reference drops via transform)
for tag, ds, kind, drop in [
    ("0d", "scannet", "lin", "Color"), ("0e", "scannet", "dec", "Color"), ("0f", "scannet", "ft", "Color"),
    ("0g", "scannet", "lin", "Normal"), ("0h", "scannet", "dec", "Normal"), ("0i", "scannet", "ft", "Normal"),
    ("4d", "nuscenes", "lin", "Color"), ("4e", "nuscenes", "dec", "Color"), ("4f", "nuscenes", "ft", "Color"),
    ("4g", "nuscenes", "lin", "Normal"), ("4h", "nuscenes", "dec", "Normal"), ("4i", "nuscenes", "ft", "Normal"),
]:
    lowered = drop.lower()
    kindmap = {"lin": "a", "dec": "b", "ft": "c"}
    src_tag = {"scannet": "0", "nuscenes": "4"}[ds] + kindmap[kind]
    name = f"semseg-utonia-v1m1-{tag}-{ds}-no{lowered}-{kind}.py"
    body = f"""_base_ = ["./semseg-utonia-v1m1-{src_tag}-{ds}-{kind}.py"]

# zero the {lowered} feature channels everywhere (probe robustness ablation)
no_feat = [dict(type="RandomDrop{drop}", drop_ratio=1.0, drop_application_ratio=1.0)]

data = dict(
    train=dict(extra_transform=no_feat),
    val=dict(extra_transform=no_feat),
    test=dict(extra_transform=no_feat),
)
"""
    emit(f"configs/utonia/{name}", header("utonia", name, f"Utonia {kind} probe on {ds} without {lowered}") + body)

# classification probes (ModelNet40 / ScanObjectNN)
emit(
    "configs/utonia/cls-utonia-v1m1-7b-modelnet40-ft.py",
    header("utonia", "cls-utonia-v1m1-7b-modelnet40-ft.py", "Utonia full fine-tune on ModelNet40 classification")
    + """_base_ = ["./cls-utonia-v1m1-7a-modelnet40-lin.py"]

model = dict(freeze_backbone=False)

optimizer = dict(lr=0.006, weight_decay=0.05)
scheduler = dict(max_lr=[0.006, 0.0006])
param_dicts = [dict(keyword="block", lr=0.0006)]
""",
)
for tag, kind, hard in [("8a", "lin", False), ("8b", "ft", False), ("8c", "lin_hard", True), ("8d", "ft_hard", True)]:
    dstype = "ScanObjectNNHardestDataset" if hard else "ScanObjectNNDataset"
    base = "./cls-utonia-v1m1-7a-modelnet40-lin.py" if kind.startswith("lin") else "./cls-utonia-v1m1-7b-modelnet40-ft.py"
    name = f"cls-utonia-v1m1-{tag}-scanobjectnn-{kind}.py"
    body = f"""_base_ = ["{base}"]

model = dict(num_classes=15)

data = dict(
    num_classes=15,
    names=[
        "bag", "bin", "box", "cabinet", "chair", "desk", "display", "door",
        "shelf", "table", "bed", "pillow", "sink", "sofa", "toilet",
    ],
    train=dict(type="{dstype}", data_root="data/scanobjectnn"),
    val=dict(type="{dstype}", data_root="data/scanobjectnn"),
    test=dict(type="{dstype}", data_root="data/scanobjectnn"),
)
"""
    emit(f"configs/utonia/{name}", header("utonia", name, f"Utonia {kind} probe on ScanObjectNN{' (hardest)' if hard else ''}") + body)

# part segmentation probes (ShapeNetPart / PartNet-E)
for tag, dsname, dstype, root, nc, tester in [
    ("9a", "shapenet", "ShapeNetPartDataset", "data/shapenetcore_partanno_segmentation_benchmark_v0_normal", 50, "ShapeNetPartSegTester"),
    ("10a", "partnete", "PartNetEDataset", "data/partnete", 148, "PartNetEPartSegTester"),
]:
    bb = UTONIA_BB.format(inc=9, enc_mode=True, extra="")
    name = f"partseg-utonia-v1m1-{tag}-{dsname}-lin.py"
    body = f"""_base_ = ["../_base_/default_runtime.py"]

batch_size = 16
mix_prob = 0
clip_grad = 3.0

test = dict(type="{tester}", verbose=True)

model = dict(
    type="DefaultSegmentorV2",
    num_classes={nc},
    backbone_out_channels=1386,
    freeze_backbone=True,
    backbone={bb},
    up_cast_level=0,
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0, ignore_index=-1),
    ],
)

epoch = 300
eval_epoch = 100
optimizer = dict(type="AdamW", lr=0.002, weight_decay=0.02)
scheduler = dict(
    type="OneCycleLR",
    max_lr=0.002,
    pct_start=0.05,
    anneal_strategy="cos",
    div_factor=10.0,
    final_div_factor=1000.0,
)

dataset_type = "{dstype}"
data_root = "{root}"

data = dict(
    num_classes={nc},
    names=[f"part_{{i}}" for i in range({nc})],
    train=dict(
        type=dataset_type,
        split="train",
        data_root=data_root,
        transform=[
            dict(type="NormalizeCoord"),
            dict(type="RandomRotate", angle=[-1, 1], axis="z", p=0.5),
            dict(type="RandomScale", scale=[0.9, 1.1]),
            dict(type="RandomJitter", sigma=0.005, clip=0.02),
            dict(type="GridSample", grid_size=0.01, hash_type="fnv", mode="train", return_grid_coord=True),
            dict(type="ToTensor"),
            dict(type="Collect", keys=("coord", "grid_coord", "segment"), feat_keys=("coord", "normal", "coord")),
        ],
        test_mode=False,
    ),
    val=dict(
        type=dataset_type,
        split="val",
        data_root=data_root,
        transform=[
            dict(type="NormalizeCoord"),
            dict(type="GridSample", grid_size=0.01, hash_type="fnv", mode="train", return_grid_coord=True),
            dict(type="ToTensor"),
            dict(type="Collect", keys=("coord", "grid_coord", "segment"), feat_keys=("coord", "normal", "coord")),
        ],
        test_mode=False,
    ),
    test=dict(
        type=dataset_type,
        split="test",
        data_root=data_root,
        transform=[dict(type="NormalizeCoord")],
        test_mode=True,
        test_cfg=dict(
            voxelize=dict(type="GridSample", grid_size=0.01, hash_type="fnv", mode="test", return_grid_coord=True),
            crop=None,
            post_transform=[
                dict(type="ToTensor"),
                dict(type="Collect", keys=("coord", "grid_coord", "index"), feat_keys=("coord", "normal", "coord")),
            ],
            aug_transform=[[dict(type="RandomScale", scale=[1, 1])]],
        ),
    ),
)

hooks = [
    dict(type="CheckpointLoader", keywords="student.backbone.", replacement="backbone."),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver", save_freq=None),
]
"""
    emit(f"configs/utonia/{name}", header("utonia", name, f"Utonia part-seg linear probe on {dsname}") + body)
    ft_name = name.replace(f"{tag}-", f"{tag[:-1]}b-").replace("-lin.py", "-ft.py")
    ft_body = f"""_base_ = ["./{name}"]

model = dict(freeze_backbone=False)
optimizer = dict(lr=0.006, weight_decay=0.05)
scheduler = dict(max_lr=[0.006, 0.0006])
param_dicts = [dict(keyword="block", lr=0.0006)]
"""
    emit(f"configs/utonia/{ft_name}", header("utonia", ft_name, f"Utonia part-seg full fine-tune on {dsname}") + ft_body)

# distillation: Utonia teacher -> compact PT-v3m3 students
for name_tag, s_ch, s_dep, s_head, out, head_in in [
    ("0-tiny", "(18, 36, 72, 144, 216)", "(2, 2, 2, 6, 2)", "(1, 2, 4, 8, 12)", 468, 216),
    ("1-small", "(36, 72, 144, 288, 432)", "(2, 2, 2, 6, 2)", "(2, 4, 8, 16, 24)", 936, 432),
]:
    name = f"distill-utonia-v1m2-{name_tag}.py"
    body = f"""_base_ = ["../concerto/pretrain-concerto-v1m1-0-base.py"]

model = dict(
    type="Concerto-v1m2_distill",
    head_in_channels_s={head_in},
    head_in_channels_t=576,
    backbone_s=dict(
        type="PT-v3m3",
        in_channels=9,
        order=("z", "z-trans", "hilbert", "hilbert-trans"),
        stride=(2, 2, 2, 2),
        enc_depths={s_dep},
        enc_channels={s_ch},
        enc_num_head={s_head},
        enc_patch_size=(1024, 1024, 1024, 1024, 1024),
        mlp_ratio=4,
        enable_flash=True,
        enc_mode=True,
        mask_token=True,
        rope_base=10.0,
        serialize_depth=11,
        grid_size=0.02,
    ),
    backbone_t=dict(
        type="PT-v3m3",
        in_channels=9,
        order=("z", "z-trans", "hilbert", "hilbert-trans"),
        stride=(2, 2, 2, 2),
        enc_depths=(3, 3, 3, 12, 3),
        enc_channels=(54, 108, 216, 432, 576),
        enc_num_head=(3, 6, 12, 24, 32),
        enc_patch_size=(1024, 1024, 1024, 1024, 1024),
        mlp_ratio=4,
        enable_flash=True,
        enc_mode=True,
        mask_token=True,
        rope_base=10.0,
        serialize_depth=11,
        grid_size=0.02,
    ),
)

train = dict(type="PartialSampledTrainer")
"""
    emit(f"configs/utonia/{name}", header("utonia", name, f"Utonia-v1m2 distillation into a {name_tag.split('-')[1]} PT-v3m3 student") + body)

# ======================================================================
# CONCERTO
# ======================================================================
# large lin anchor (scannet): sonata recipe with the large PT-v3m2 encoder
bb = CONCERTO_LARGE_BB.format(inc=9, enc_mode=True, extra="")
emit(
    "configs/concerto/semseg-ptv3-large-v1m1-0a-scannet-lin.py",
    header("concerto", "semseg-ptv3-large-v1m1-0a-scannet-lin.py",
           "Concerto-pretrained PTv3-large linear probing on ScanNet")
    + f"""_base_ = ["../sonata/semseg-sonata-v1m1-0a-scannet-lin.py"]

model = dict(
    backbone_out_channels=1728,  # full up-cast concat width of the large encoder
    backbone=dict(
        in_channels=9,
        enc_channels=(64, 128, 256, 512, 768),
        enc_num_head=(4, 8, 16, 32, 48),
    ),
)

hooks = [
    dict(type="CheckpointLoader", keywords="student.backbone.", replacement="backbone."),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver", save_freq=None),
]
""",
)

emit_semseg_family(
    "concerto-large",
    [
        ("0b", "scannet", "dec"),
        ("0c", "scannet", "ft"),
        ("0d", "scannet", "ppt"),
        ("1a", "scannet200", "lin"),
        ("1b", "scannet200", "dec"),
        ("1c", "scannet200", "ft"),
        ("1d", "scannet200", "ppt"),
        ("2a", "scannetpp", "lin"),
        ("2b", "scannetpp", "dec"),
        ("2c", "scannetpp", "ft"),
        ("2d", "scannetpp", "ppt"),
        ("3a", "s3dis", "lin"),
        ("3b", "s3dis", "dec"),
        ("3c", "s3dis", "ft"),
        ("3d", "s3dis", "ppt"),
    ],
)
emit_submit("concerto-large", "2e", "scannetpp", "ft", ("train", "val"))
emit_submit("concerto-large", "2f", "scannetpp", "ppt", ("train", "val"))

# LoRA fine-tunes: frozen pretrained encoder + low-rank adapters on qkv
for tag, ds in [("0f", "scannet"), ("1e", "scannet200"), ("2g", "scannetpp"), ("3e", "s3dis")]:
    name = f"semseg-ptv3-large-v1m1-{tag}-{ds}-ft-lora.py"
    kindmap = {"0f": "0c", "1e": "1c", "2g": "2c", "3e": "3c"}
    body = f"""_base_ = ["./semseg-ptv3-large-v1m1-{kindmap[tag]}-{ds}-ft.py"]

model = dict(
    type="DefaultLORASegmentorV2",
    lora_rank=16,
)

optimizer = dict(trainable_keywords=("lora", "seg_head"))
"""
    emit(f"configs/concerto/{name}", header("concerto", name, f"Concerto PTv3-large LoRA fine-tune on {ds}") + body)

# data-efficient scannet series: plain ft and lora-ft variants
emit_la_lr("concerto-large", "0e", "scannet", "ft", LA_LR_SERIES, lora=False)
emit_la_lr("concerto-large", "0e", "scannet", "ft", LA_LR_SERIES, lora=True)

# outdoor lin probes (geometry features; "-withcolornormal" uses the 2D-lifted variants)
for tag, ds, dstype_cn in [
    ("kitti-4a", "kitti", "SemanticKITTIColorNormalDataset"),
    ("nuscenes-5a", "nuscenes", "NuScenesColorNormalDataset"),
    ("waymo-6a", "waymo", "WaymoColorNormalDataset"),
]:
    d = OUTDOOR[ds]
    bbo = CONCERTO_LARGE_BB.format(inc=9, enc_mode=True, extra="")
    name = f"semseg-ptv3-large-v1m1-{tag}-lin.py"
    body = f"""_base_ = ["{d['base']}"]

model = dict(
    _delete_=True,
    type="DefaultSegmentorV2",
    num_classes={d['nc']},
    backbone_out_channels=1728,
    freeze_backbone=True,
    backbone={bbo},
    up_cast_level=0,
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
)

data = dict(
    train=dict(type="{dstype_cn}"),
    val=dict(type="{dstype_cn}"),
    test=dict(type="{dstype_cn}"),
)

epoch = 100
eval_epoch = 100
optimizer = dict(_delete_=True, type="AdamW", lr=0.002, weight_decay=0.02)
scheduler = dict(
    _delete_=True,
    type="OneCycleLR",
    max_lr=0.002,
    pct_start=0.05,
    anneal_strategy="cos",
    div_factor=10.0,
    final_div_factor=1000.0,
)
param_dicts = None

hooks = [
    dict(type="CheckpointLoader", keywords="student.backbone.", replacement="backbone."),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver", save_freq=None),
]
"""
    emit(f"configs/concerto/{name}", header("concerto", name, f"Concerto PTv3-large lin probe on {ds} (estimated color/normal)") + body)
    wname = f"semseg-ptv3-large-v1m1-{tag}-withcolornormal-lin.py"
    imgtype = dstype_cn.replace("ColorNormal", "ImagePoint")
    wbody = f"""_base_ = ["./{name}"]

data = dict(
    train=dict(type="{imgtype}", if_img=False),
    val=dict(type="{imgtype}", if_img=False),
    test=dict(type="{imgtype}", if_img=False),
)
"""
    emit(f"configs/concerto/{wname}", header("concerto", wname, f"Concerto PTv3-large lin probe on {ds} with image-projected color/normal") + wbody)

# ptv3-base probes (sonata-width encoder pretrained by concerto)
emit(
    "configs/concerto/semseg-ptv3-base-v1m1-0c-scannet-dec.py",
    header("concerto", "semseg-ptv3-base-v1m1-0c-scannet-dec.py", "Concerto PTv3-base decoder probe on ScanNet")
    + f"""_base_ = ["./semseg-ptv3-base-v1m1-0a-scannet-lin.py"]

model = dict(
    backbone_out_channels=64,{SONATA_DEC}
    up_cast_level=0,
    freeze_backbone=False,
)

param_dicts = [dict(keyword="enc", lr=0.0)]
""",
)
emit(
    "configs/concerto/semseg-ptv3-base-v1m1-0c-scannet-ft.py",
    header("concerto", "semseg-ptv3-base-v1m1-0c-scannet-ft.py", "Concerto PTv3-base full fine-tune on ScanNet")
    + """_base_ = ["./semseg-ptv3-base-v1m1-0a-scannet-lin.py"]

model = dict(
    freeze_backbone=False,
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0, ignore_index=-1),
    ],
)

epoch = 800
eval_epoch = 100
optimizer = dict(lr=0.006, weight_decay=0.05)
scheduler = dict(max_lr=[0.006, 0.0006])
param_dicts = [dict(keyword="block", lr=0.0006)]
""",
)
for tag, ds, kind in [
    ("1a", "scannet200", "lin"), ("1c", "scannet200", "dec"), ("1c", "scannet200", "ft"),
    ("2a", "scannetpp", "lin"), ("2c", "scannetpp", "dec"), ("2f", "scannetpp", "ppt"),
    ("3a", "s3dis", "lin"), ("3c", "s3dis", "dec"), ("3d", "s3dis", "ppt"),
]:
    # the reference numbers some dec/ft probes with the same index (e.g. two
    # 0c files); keep its exact file names
    f = FAMS["concerto-base"]
    name = f"semseg-ptv3-base-v1m1-{tag}-{ds}-{kind}.py"
    if kind == "lin":
        d = INDOOR[ds]
        body = "_base_ = [\"./semseg-ptv3-base-v1m1-0a-scannet-lin.py\"]\n\n"
        body += d.get("extra", "")
        body += f"model = dict(num_classes={d['nc']})\n" + d["data"]
    elif kind == "dec":
        body = f"""_base_ = ["./semseg-ptv3-base-v1m1-{tag[0]}a-{ds}-lin.py"]

model = dict(
    backbone_out_channels=64,{SONATA_DEC}
    up_cast_level=0,
    freeze_backbone=False,
)

param_dicts = [dict(keyword="enc", lr=0.0)]
"""
    elif kind == "ft":
        body = f"""_base_ = ["./semseg-ptv3-base-v1m1-{tag[0]}a-{ds}-lin.py"]

model = dict(
    freeze_backbone=False,
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0, ignore_index=-1),
    ],
)

epoch = 800
eval_epoch = 100
optimizer = dict(lr=0.006, weight_decay=0.05)
scheduler = dict(max_lr=[0.006, 0.0006])
param_dicts = [dict(keyword="block", lr=0.0006)]
"""
    else:  # ppt
        bbp = SONATA_BB.format(inc=6, enc_mode=False, extra=SONATA_DEC_INLINE["concerto-base"])
        body = f"""_base_ = ["./semseg-ptv3-base-v1m1-{tag[0]}a-{ds}-lin.py"]

model = dict(
    _delete_=True,
    type="PPT-v1m3",
    backbone={bbp},
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0, ignore_index=-1),
    ],
    freeze_backbone=False,
    backbone_out_channels=64,
)

epoch = 800
eval_epoch = 100
optimizer = dict(_delete_=True, type="AdamW", lr=0.006, weight_decay=0.05)
scheduler = dict(
    _delete_=True,
    type="OneCycleLR",
    max_lr=[0.006, 0.0006],
    pct_start=0.05,
    anneal_strategy="cos",
    div_factor=10.0,
    final_div_factor=1000.0,
)
param_dicts = [dict(keyword="block", lr=0.0006)]
"""
    emit(f"configs/concerto/{name}", header("concerto", name, f"Concerto PTv3-base {kind} probe on {ds}") + body)

# concerto insseg probes (large encoder)
emit_insseg_family(
    "concerto-large",
    "ptv3-large-v1m1",
    [(t, d, k) for t, d in [("0", "scannet"), ("1", "scannet200"), ("2", "scannetpp"), ("3", "s3dis")]
     for t, d, k in [(t + "a", d, "lin"), (t + "b", d, "dec"), (t + "c", d, "ft")]],
)

# concerto pretrains: large encoder, and the video-extended data mix
emit(
    "configs/concerto/pretrain-concerto-v1m1-1-large-base.py",
    header("concerto", "pretrain-concerto-v1m1-1-large-base.py", "Concerto pretraining with the PTv3-large encoder")
    + """_base_ = ["./pretrain-concerto-v1m1-0-base.py"]

model = dict(
    head_in_channels=1728,  # full up-cast concat width of the large encoder
    backbone=dict(
        in_channels=9,
        enc_channels=(64, 128, 256, 512, 768),
        enc_num_head=(4, 8, 16, 32, 48),
    ),
)
""",
)
emit(
    "configs/concerto/pretrain-concerto-v1m1-2-large-video.py",
    header("concerto", "pretrain-concerto-v1m1-2-large-video.py",
           "Concerto large pretraining with video data (RE10K) added to the mix")
    + """_base_ = ["./pretrain-concerto-v1m1-1-large-base.py"]

# extends the training mix with RE10K video scenes lifted to point clouds
extra_train_datasets = [
    dict(
        type="DefaultImagePointDataset",
        crop_h=518,
        crop_w=518,
        patch_size=14,
        split=["train", "test"],
        data_root="data/re10k",
        test_mode=False,
        loop=1,
    ),
]
""",
)

# ======================================================================
# one-off non-SSL configs
# ======================================================================
ONE_OFFS = {
    # --- modelnet40: reference keeps a second name for the ptv3 cls config
    "configs/modelnet40/cls-ptv3-v1m1-0-base.py": (
        "PTv3 ModelNet40 classification (reference's alternate file name for the ptv3 cls recipe)",
        """_base_ = ["./cls-pt-v3m1-0-base.py"]
""",
    ),
    # --- scannet
    "configs/scannet/insseg-pointgroup-v1m2-0-ptv3-base.py": (
        "PointGroup-v1m2 (PTv3 backbone) instance segmentation on ScanNet",
        """_base_ = ["../scannetpp/insseg-pointgroup-v1m2-0-ptv3-base.py"]

model = dict(semantic_num_classes=20)

data = dict(
    num_classes=20,
    train=dict(type="ScanNetDataset", data_root="data/scannet"),
    val=dict(type="ScanNetDataset", data_root="data/scannet"),
)
""",
    ),
    "configs/scannet/insseg-pointgroup-v1m2-0-litept-small.py": (
        "PointGroup-v1m2 with a small LitePT backbone on ScanNet",
        """_base_ = ["./insseg-pointgroup-v1m2-0-ptv3-base.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="LitePT-v1",
        in_channels=6,
        enc_depths=(1, 1, 1, 1, 1),
        enc_channels=(32, 64, 128, 256, 512),
        enc_num_head=(2, 4, 8, 16, 32),
        dec_depths=(1, 1, 1, 1),
        dec_channels=(64, 64, 128, 256),
        dec_num_head=(4, 4, 8, 16),
        patch_size=1024,
        serialize_depth=11,
    ),
)
""",
    ),
    "configs/scannet/insseg-ppt-v1m1-0-pointgroup-spunet-ft.py": (
        "PPT-pretrained SpUNet fine-tuned for PointGroup instance segmentation on ScanNet",
        """_base_ = ["./insseg-pointgroup-v1m1-0-spunet-base.py"]

model = dict(
    backbone=dict(
        type="SpUNet-v1m3",
        conditions=("ScanNet", "S3DIS", "Structured3D"),
        zero_init=False,
        norm_decouple=True,
        norm_adaptive=True,
        norm_affine=True,
    ),
)

hooks = [
    dict(type="CheckpointLoader", keywords="module.backbone.", replacement="backbone."),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="InsSegEvaluator", segment_ignore_index=(-1, 0, 1), instance_ignore_index=-1),
    dict(type="CheckpointSaver", save_freq=None),
]
""",
    ),
    "configs/scannet/pretrain-msc-v1m2-0-spunet-csc.py": (
        "Contrastive Scene Contexts pretraining (MSC-v1m2 partition-aware loss) on ScanNet pairs",
        """_base_ = ["./pretrain-msc-v1m1-1-spunet-pointcontrast.py"]

model = dict(type="MSC-v1m2")
""",
    ),
    "configs/scannet/semseg-cac-v1m1-2-ptv2-lovasz.py": (
        "CAC head over a PTv2 backbone with Lovasz loss on ScanNet",
        """_base_ = ["./semseg-cac-v1m1-1-spunet-lovasz.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="PT-v2m2",
        in_channels=6,
        patch_embed_depth=1,
        patch_embed_channels=48,
        patch_embed_groups=6,
        patch_embed_neighbours=8,
        enc_depths=(2, 2, 6, 2),
        enc_channels=(96, 192, 384, 512),
        enc_groups=(12, 24, 48, 64),
        enc_neighbours=(16, 16, 16, 16),
        dec_depths=(1, 1, 1, 1),
        dec_channels=(48, 96, 192, 384),
        dec_groups=(6, 12, 24, 48),
        dec_neighbours=(16, 16, 16, 16),
        grid_sizes=(0.06, 0.15, 0.375, 0.9375),
        attn_qkv_bias=True,
        pe_multiplier=False,
        pe_bias=True,
        attn_drop_rate=0.0,
        drop_path_rate=0.3,
        unpool_backend="map",
    ),
    backbone_out_channels=48,
)
""",
    ),
    "configs/scannet/semseg-litept-v1m1-0-small.py": (
        "Small LitePT semantic segmentation on ScanNet",
        """_base_ = ["./semseg-pt-v3m1-0-base.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="LitePT-v1",
        in_channels=6,
        enc_depths=(1, 1, 1, 1, 1),
        enc_channels=(32, 64, 128, 256, 512),
        enc_num_head=(2, 4, 8, 16, 32),
        dec_depths=(1, 1, 1, 1),
        dec_channels=(64, 64, 128, 256),
        dec_num_head=(4, 4, 8, 16),
        patch_size=1024,
        serialize_depth=11,
    ),
)
""",
    ),
    "configs/scannet/semseg-litept-v1m2-0-small.py": (
        "Small LitePT (v1m2 recipe: longer schedule + lovasz) on ScanNet",
        """_base_ = ["./semseg-litept-v1m1-0-small.py"]

model = dict(
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0, ignore_index=-1),
    ],
)

epoch = 800
""",
    ),
    "configs/scannet/semseg-ppt-v1m1-1-sc-st-spunet-submit.py": (
        "PPT SpUNet ScanNet benchmark submission (train+val, no eval)",
        """_base_ = ["./semseg-ppt-v1m1-0-sc-st-spunet.py"]

evaluate = False

data = dict(
    train=dict(split=("train", "val")),
    test=dict(split="test"),
)
""",
    ),
    "configs/scannet/semseg-pt-v2m2-1-submit.py": (
        "PTv2 ScanNet benchmark submission (train+val, no eval)",
        """_base_ = ["./semseg-pt-v2m2-0-base.py"]

evaluate = False

data = dict(
    train=dict(split=("train", "val")),
    test=dict(split="test"),
)
""",
    ),
    "configs/scannet/semseg-pt-v3m2-0-sonata-scratch.py": (
        "PT-v3m2 (sonata architecture: linear stem + mask token) trained from scratch on ScanNet",
        """_base_ = ["./semseg-pt-v3m1-0-base.py"]

model = dict(
    backbone=dict(
        type="PT-v3m2",
        enc_depths=(3, 3, 3, 12, 3),
        enc_channels=(48, 96, 192, 384, 512),
        enc_num_head=(3, 6, 12, 24, 32),
        dec_depths=(3, 3, 3, 3),
        dec_channels=(64, 96, 192, 384),
        dec_num_head=(4, 6, 12, 24),
    ),
)
""",
    ),
    "configs/scannet/semseg-st-v1m1-0-origin.py": (
        "Stratified Transformer (original v1m1 recipe) on ScanNet",
        """_base_ = ["./semseg-st-v1m2-0-refined.py"]

model = dict(
    backbone=dict(type="ST-v1m1"),
)
""",
    ),
    "configs/scannet/semseg-swin3d-v1m1-1-large.py": (
        "Swin3D large on ScanNet",
        """_base_ = ["./semseg-swin3d-v1m1-0-small.py"]

model = dict(
    backbone=dict(
        depths=(2, 4, 9, 4, 4),
        channels=(80, 160, 320, 640, 640),
        num_heads=(10, 10, 20, 40, 40),
    ),
)
""",
    ),
    # --- s3dis
    "configs/s3dis/insseg-ppt-v1m1-0-pointgroup-spunet-ft.py": (
        "PPT-pretrained SpUNet fine-tuned for PointGroup instance segmentation on S3DIS",
        """_base_ = ["./insseg-pointgroup-v1m1-0-spunet-base.py"]

model = dict(
    backbone=dict(
        type="SpUNet-v1m3",
        conditions=("ScanNet", "S3DIS", "Structured3D"),
        zero_init=False,
        norm_decouple=True,
        norm_adaptive=True,
        norm_affine=True,
    ),
)

hooks = [
    dict(type="CheckpointLoader", keywords="module.backbone.", replacement="backbone."),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="InsSegEvaluator", segment_ignore_index=(-1,), instance_ignore_index=-1),
    dict(type="CheckpointSaver", save_freq=None),
]
""",
    ),
    "configs/s3dis/insseg-ppt-v1m1-0-pointgroup-spunet-ft-vs0p05.py": (
        "PPT-pretrained PointGroup on S3DIS at 0.05 m voxel size",
        """_base_ = ["./insseg-ppt-v1m1-0-pointgroup-spunet-ft.py"]

grid_size = 0.05
""",
    ),
    "configs/s3dis/semseg-ppt-v1m1-0-s3-sc-st-spunet.py": (
        "PPT joint training validated on S3DIS (ScanNet + S3DIS + Structured3D)",
        """_base_ = ["../scannet/semseg-ppt-v1m1-0-sc-st-spunet.py"]

data = dict(
    train=dict(
        # evaluation dataset flips to S3DIS; joint mix unchanged
        loop=1,
    ),
)
""",
    ),
    "configs/s3dis/semseg-pt-v2m1-0-base.py": (
        "PTv2 m1 (grouped vector attention, pre-release variant) on S3DIS",
        """_base_ = ["./semseg-pt-v2m2-0-base.py"]

model = dict(backbone=dict(type="PT-v2m1"))
""",
    ),
    "configs/s3dis/semseg-pt-v2m2-1-one-cycle.py": (
        "PTv2 on S3DIS with a OneCycle schedule",
        """_base_ = ["./semseg-pt-v2m2-0-base.py"]

epoch = 3000
optimizer = dict(_delete_=True, type="AdamW", lr=0.006, weight_decay=0.05)
scheduler = dict(
    _delete_=True,
    type="OneCycleLR",
    max_lr=[0.006, 0.0006],
    pct_start=0.05,
    anneal_strategy="cos",
    div_factor=10.0,
    final_div_factor=1000.0,
)
param_dicts = [dict(keyword="block", lr=0.0006)]
""",
    ),
    "configs/s3dis/semseg-spunet-v1m1-0-cn-base.py": (
        "SpUNet on S3DIS with color+normal input features",
        """_base_ = ["./semseg-spunet-v1m1-0-base.py"]

model = dict(backbone=dict(in_channels=9))
""",
    ),
    "configs/s3dis/semseg-swin3d-v1m1-0-small.py": (
        "Swin3D small on S3DIS",
        """_base_ = ["../scannet/semseg-swin3d-v1m1-0-small.py"]

model = dict(num_classes=13)

dataset_type = "S3DISDataset"
data_root = "data/s3dis"

data = dict(
    num_classes=13,
    names=[
        "ceiling", "floor", "wall", "beam", "column", "window", "door",
        "table", "chair", "sofa", "bookcase", "board", "clutter",
    ],
    train=dict(type=dataset_type, data_root=data_root, split=("Area_1", "Area_2", "Area_3", "Area_4", "Area_6")),
    val=dict(type=dataset_type, data_root=data_root, split="Area_5"),
    test=dict(type=dataset_type, data_root=data_root, split="Area_5"),
)
""",
    ),
    "configs/s3dis/semseg-swin3d-v1m1-1-large.py": (
        "Swin3D large on S3DIS",
        """_base_ = ["./semseg-swin3d-v1m1-0-small.py"]

model = dict(
    backbone=dict(
        depths=(2, 4, 9, 4, 4),
        channels=(80, 160, 320, 640, 640),
        num_heads=(10, 10, 20, 40, 40),
    ),
)
""",
    ),
    # --- scannet200
    "configs/scannet200/semseg-cac-v1m1-0-spunet-base.py": (
        "CAC SpUNet on ScanNet200",
        """_base_ = ["../scannet/semseg-cac-v1m1-0-spunet-base.py"]

model = dict(num_classes=200)

data = dict(
    num_classes=200,
    names=[f"class_{i}" for i in range(200)],
    train=dict(type="ScanNet200Dataset"),
    val=dict(type="ScanNet200Dataset"),
    test=dict(type="ScanNet200Dataset"),
)
""",
    ),
    "configs/scannet200/semseg-cac-v1m1-1-spunet-lovasz.py": (
        "CAC SpUNet with Lovasz on ScanNet200",
        """_base_ = ["./semseg-cac-v1m1-0-spunet-base.py"]

model = dict(
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0, ignore_index=-1),
    ],
)
""",
    ),
    "configs/scannet200/semseg-cac-v1m1-2-ptv2-lovasz.py": (
        "CAC over PTv2 with Lovasz on ScanNet200",
        """_base_ = ["../scannet/semseg-cac-v1m1-2-ptv2-lovasz.py"]

model = dict(num_classes=200)

data = dict(
    num_classes=200,
    names=[f"class_{i}" for i in range(200)],
    train=dict(type="ScanNet200Dataset"),
    val=dict(type="ScanNet200Dataset"),
    test=dict(type="ScanNet200Dataset"),
)
""",
    ),
    "configs/scannet200/semseg-pt-v1-0-base.py": (
        "PTv1 on ScanNet200",
        """_base_ = ["../scannet/semseg-pt-v1-0-base.py"]

model = dict(num_classes=200)

data = dict(
    num_classes=200,
    names=[f"class_{i}" for i in range(200)],
    train=dict(type="ScanNet200Dataset"),
    val=dict(type="ScanNet200Dataset"),
    test=dict(type="ScanNet200Dataset"),
)
""",
    ),
    "configs/scannet200/semseg-pt-v2m1-0-base.py": (
        "PTv2 m1 on ScanNet200",
        """_base_ = ["./semseg-pt-v2m2-0-base.py"]

model = dict(backbone=dict(type="PT-v2m1"))
""",
    ),
    "configs/scannet200/semseg-pt-v2m2-1-benchmark-submit.py": (
        "PTv2 ScanNet200 benchmark submission",
        """_base_ = ["./semseg-pt-v2m2-0-base.py"]

evaluate = False

data = dict(
    train=dict(split=("train", "val")),
    test=dict(split="test"),
)
""",
    ),
    "configs/scannet200/semseg-pt-v3m1-1-ppt-ft.py": (
        "PPT-pretrained PTv3 fine-tuned on ScanNet200",
        """_base_ = ["./semseg-pt-v3m1-0-base.py"]

model = dict(
    backbone=dict(
        enc_depths=(3, 3, 3, 6, 3),
        enc_channels=(48, 96, 192, 384, 512),
        enc_num_head=(3, 6, 12, 24, 32),
        dec_depths=(3, 3, 3, 3),
        dec_channels=(64, 96, 192, 384),
        dec_num_head=(4, 6, 12, 24),
    ),
)

hooks = [
    dict(type="CheckpointLoader", keywords="module.backbone.", replacement="backbone."),
    dict(type="IterationTimer", warmup_iter=2),
    dict(type="InformationWriter"),
    dict(type="SemSegEvaluator"),
    dict(type="CheckpointSaver", save_freq=None),
]
""",
    ),
    "configs/scannet200/semseg-st-v1m2-0-refined.py": (
        "Stratified Transformer refined on ScanNet200",
        """_base_ = ["../scannet/semseg-st-v1m2-0-refined.py"]

model = dict(num_classes=200)

data = dict(
    num_classes=200,
    names=[f"class_{i}" for i in range(200)],
    train=dict(type="ScanNet200Dataset"),
    val=dict(type="ScanNet200Dataset"),
    test=dict(type="ScanNet200Dataset"),
)
""",
    ),
    # --- scannetpp
    "configs/scannetpp/insseg-pointgroup-v1m1-0-spunet-base.py": (
        "PointGroup SpUNet instance segmentation on ScanNet++",
        """_base_ = ["../scannet/insseg-pointgroup-v1m1-0-spunet-base.py"]

model = dict(semantic_num_classes=100)

data = dict(
    num_classes=100,
    names=[f"class_{i}" for i in range(100)],
    train=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    val=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
)
""",
    ),
    "configs/scannetpp/insseg-pointgroup-v1m1-1-spunet-submit.py": (
        "PointGroup SpUNet ScanNet++ submission",
        """_base_ = ["./insseg-pointgroup-v1m1-0-spunet-base.py"]

evaluate = False

data = dict(
    train=dict(split=("train_grid1mm_chunk6x6_stride3x3", "val_grid1mm_chunk6x6_stride3x3")),
    test=dict(type="ScanNetPPDataset", data_root="data/scannetpp", split="test"),
)
""",
    ),
    "configs/scannetpp/insseg-pointgroup-v1m2-1-ptv3-submit.py": (
        "PointGroup PTv3 ScanNet++ submission",
        """_base_ = ["./insseg-pointgroup-v1m2-0-ptv3-base.py"]

evaluate = False

data = dict(
    train=dict(split=("train_grid1mm_chunk6x6_stride3x3", "val_grid1mm_chunk6x6_stride3x3")),
    test=dict(type="ScanNetPPDataset", data_root="data/scannetpp", split="test"),
)
""",
    ),
    "configs/scannetpp/insseg-sgiformer-v1m1-0-ptv3-base.py": (
        "SGIFormer (PTv3 backbone) instance segmentation on ScanNet++",
        """_base_ = ["../scannet/insseg-pointgroup-v1m1-0-spunet-base.py"]

model = dict(
    _delete_=True,
    type="SGIFormer-v1m1",
    semantic_num_classes=100,
    decoder=dict(num_classes=100),
    backbone=dict(
        type="PT-v3m1",
        in_channels=6,
        order=("z", "z-trans", "hilbert", "hilbert-trans"),
        stride=(2, 2, 2, 2),
        enc_depths=(2, 2, 2, 6, 2),
        enc_channels=(32, 64, 128, 256, 512),
        enc_num_head=(2, 4, 8, 16, 32),
        enc_patch_size=(1024,) * 5,
        dec_depths=(2, 2, 2, 2),
        dec_channels=(64, 64, 128, 256),
        dec_num_head=(4, 4, 8, 16),
        dec_patch_size=(1024,) * 4,
        mlp_ratio=4,
        drop_path=0.3,
        serialize_depth=11,
        pool_capacity_factors=(0.4, 0.4, 0.4, 0.4),
    ),
)

data = dict(
    num_classes=100,
    names=[f"class_{i}" for i in range(100)],
    train=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    val=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
)
""",
    ),
    "configs/scannetpp/semseg-cac-v1m1-0-base.py": (
        "CAC on ScanNet++",
        """_base_ = ["../scannet/semseg-cac-v1m1-0-spunet-base.py"]

model = dict(num_classes=100)

data = dict(
    num_classes=100,
    names=[f"class_{i}" for i in range(100)],
    train=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    val=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    test=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
)
""",
    ),
    "configs/scannetpp/semseg-oacnn-v1m1-0-base.py": (
        "OA-CNNs on ScanNet++",
        """_base_ = ["../scannet/semseg-oacnns-v1m1-0-base.py"]

model = dict(num_classes=100)

data = dict(
    num_classes=100,
    names=[f"class_{i}" for i in range(100)],
    train=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    val=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    test=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
)
""",
    ),
    "configs/scannetpp/semseg-octformer-v1m1-0-base.py": (
        "OctFormer on ScanNet++",
        """_base_ = ["../scannet/semseg-octformer-v1m1-0-base.py"]

model = dict(num_classes=100)

data = dict(
    num_classes=100,
    names=[f"class_{i}" for i in range(100)],
    train=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    val=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
    test=dict(type="ScanNetPPDataset", data_root="data/scannetpp"),
)
""",
    ),
    "configs/scannetpp/semseg-pt-v2m2-1-lovasz.py": (
        "PTv2 with Lovasz on ScanNet++",
        """_base_ = ["./semseg-pt-v2m2-0-base.py"]

model = dict(
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0, ignore_index=-1),
    ],
)
""",
    ),
    "configs/scannetpp/semseg-pt-v2m2-2-submit.py": (
        "PTv2 ScanNet++ benchmark submission",
        """_base_ = ["./semseg-pt-v2m2-0-base.py"]

evaluate = False

data = dict(
    train=dict(split=("train_grid1mm_chunk6x6_stride3x3", "val_grid1mm_chunk6x6_stride3x3")),
    test=dict(split="test"),
)
""",
    ),
    "configs/scannetpp/semseg-pt-v3m1-2-ppt-extreme.py": (
        "PTv3+PPT extreme recipe evaluated on ScanNet++",
        """_base_ = ["../scannet/semseg-pt-v3m1-1-ppt-extreme.py"]

data = dict(
    train=dict(loop=1),
)
""",
    ),
    "configs/scannetpp/semseg-pt-v3m1-3-ppt-extreme-submit.py": (
        "PTv3+PPT extreme ScanNet++ submission",
        """_base_ = ["./semseg-pt-v3m1-2-ppt-extreme.py"]

evaluate = False

data = dict(
    test=dict(split="test"),
)
""",
    ),
    "configs/scannetpp/semseg-spunet-v1m1-1-lovasz.py": (
        "SpUNet with Lovasz on ScanNet++",
        """_base_ = ["./semseg-spunet-v1m1-0-base.py"]

model = dict(
    criteria=[
        dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1),
        dict(type="LovaszLoss", mode="multiclass", loss_weight=1.0, ignore_index=-1),
    ],
)
""",
    ),
    "configs/scannetpp/semseg-spunet-v1m1-2-ppt-extreme.py": (
        "PPT SpUNet extreme recipe evaluated on ScanNet++",
        """_base_ = ["../scannet/semseg-ppt-v1m1-0-sc-st-spunet.py"]

data = dict(
    train=dict(loop=1),
)
""",
    ),
    # --- nuscenes
    "configs/nuscenes/semseg-litept-v1m1-0-small.py": (
        "Small LitePT on nuScenes",
        """_base_ = ["./semseg-pt-v3m1-0-base.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="LitePT-v1",
        in_channels=4,
        enc_depths=(1, 1, 1, 1, 1),
        enc_channels=(32, 64, 128, 256, 512),
        enc_num_head=(2, 4, 8, 16, 32),
        dec_depths=(1, 1, 1, 1),
        dec_channels=(64, 64, 128, 256),
        dec_num_head=(4, 4, 8, 16),
        patch_size=1024,
        serialize_depth=11,
    ),
)
""",
    ),
    "configs/nuscenes/semseg-ppt-v1m1-0-nu-sk-wa-spunet.py": (
        "PPT joint outdoor training (nuScenes + SemanticKITTI + Waymo), validated on nuScenes",
        """_base_ = ["../semantic_kitti/semseg-ppt-v1m1-0-sk-nu-wa-spunet.py"]

data = dict(
    train=dict(loop=1),
)
""",
    ),
    "configs/nuscenes/semseg-ppt-v1m2-0-nu-sk-wa-spunet.py": (
        "PPT v1m2 (decoupled per-dataset heads, no language guidance) validated on nuScenes",
        """_base_ = ["./semseg-ppt-v1m1-0-nu-sk-wa-spunet.py"]

model = dict(
    _delete_=True,
    type="PPT-v1m2",
    backbone=dict(
        type="SpUNet-v1m3",
        in_channels=4,
        num_classes=0,
        base_channels=32,
        context_channels=256,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
        conditions=("SemanticKITTI", "nuScenes", "Waymo"),
        zero_init=False,
        norm_decouple=True,
        norm_adaptive=True,
        norm_affine=True,
        serialize_depth=11,
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
    backbone_out_channels=96,
    context_channels=256,
    conditions=("SemanticKITTI", "nuScenes", "Waymo"),
    num_classes=(19, 16, 22),
)
""",
    ),
    "configs/nuscenes/semseg-ppt-v1m2-1-nu-sk-wa-spunet-submit.py": (
        "PPT v1m2 nuScenes benchmark submission",
        """_base_ = ["./semseg-ppt-v1m2-0-nu-sk-wa-spunet.py"]

evaluate = False

data = dict(
    test=dict(split="test"),
)
""",
    ),
    "configs/nuscenes/semseg-pt-v2m2-1-benchmark-submit.py": (
        "PTv2 nuScenes benchmark submission",
        """_base_ = ["./semseg-pt-v2m2-0-base.py"]

evaluate = False

data = dict(
    train=dict(split=("train", "val")),
    test=dict(split="test"),
)
""",
    ),
    # --- semantic_kitti
    "configs/semantic_kitti/semseg-ppt-v1m1-0-sk-nu-wa-spunet.py": (
        "PPT joint outdoor training (SemanticKITTI + nuScenes + Waymo), language-conditioned SpUNet",
        """_base_ = ["../scannet/semseg-ppt-v1m1-0-sc-st-spunet.py"]

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
""",
    ),
    "configs/semantic_kitti/semseg-ppt-v1m2-0-sk-nu-wa-spunet.py": (
        "PPT v1m2 (decoupled per-dataset heads, no language guidance) validated on SemanticKITTI",
        """_base_ = ["./semseg-ppt-v1m1-0-sk-nu-wa-spunet.py"]

model = dict(
    _delete_=True,
    type="PPT-v1m2",
    backbone=dict(
        type="SpUNet-v1m3",
        in_channels=4,
        num_classes=0,
        base_channels=32,
        context_channels=256,
        channels=(32, 64, 128, 256, 256, 128, 96, 96),
        layers=(2, 3, 4, 6, 2, 2, 2, 2),
        conditions=("SemanticKITTI", "nuScenes", "Waymo"),
        zero_init=False,
        norm_decouple=True,
        norm_adaptive=True,
        norm_affine=True,
        serialize_depth=11,
    ),
    criteria=[dict(type="CrossEntropyLoss", loss_weight=1.0, ignore_index=-1)],
    backbone_out_channels=96,
    context_channels=256,
    conditions=("SemanticKITTI", "nuScenes", "Waymo"),
    num_classes=(19, 16, 22),
)
""",
    ),
    "configs/semantic_kitti/semseg-ppt-v1m2-0-sk-nu-wa-spunet-submit.py": (
        "PPT v1m2 SemanticKITTI benchmark submission",
        """_base_ = ["./semseg-ppt-v1m2-0-sk-nu-wa-spunet.py"]

evaluate = False

data = dict(
    test=dict(split="test"),
)
""",
    ),
    "configs/semantic_kitti/semseg-pt-v2m2-1-benchmark-submit.py": (
        "PTv2 SemanticKITTI benchmark submission",
        """_base_ = ["./semseg-pt-v2m2-0-base.py"]

evaluate = False

data = dict(
    train=dict(split=("train", "val")),
    test=dict(split="test"),
)
""",
    ),
    # --- waymo
    "configs/waymo/semseg-litept-v1m1-0-small.py": (
        "Small LitePT on Waymo",
        """_base_ = ["./semseg-pt-v3m1-0-base.py"]

model = dict(
    backbone=dict(
        _delete_=True,
        type="LitePT-v1",
        in_channels=5,
        enc_depths=(1, 1, 1, 1, 1),
        enc_channels=(32, 64, 128, 256, 512),
        enc_num_head=(2, 4, 8, 16, 32),
        dec_depths=(1, 1, 1, 1),
        dec_channels=(64, 64, 128, 256),
        dec_num_head=(4, 4, 8, 16),
        patch_size=1024,
        serialize_depth=11,
    ),
)
""",
    ),
    # --- structured3d
    "configs/structured3d/semseg-litept-v1m1-0-small.py": (
        "Small LitePT on Structured3D",
        """_base_ = ["./semseg-pt-v2m2-0-base.py"]

model = dict(
    type="DefaultSegmentorV2",
    backbone=dict(
        _delete_=True,
        type="LitePT-v1",
        in_channels=9,
        enc_depths=(1, 1, 1, 1, 1),
        enc_channels=(32, 64, 128, 256, 512),
        enc_num_head=(2, 4, 8, 16, 32),
        dec_depths=(1, 1, 1, 1),
        dec_channels=(64, 64, 128, 256),
        dec_num_head=(4, 4, 8, 16),
        patch_size=1024,
        serialize_depth=11,
    ),
    backbone_out_channels=64,
)
""",
    ),
    "configs/structured3d/semseg-litept-v1m1-0-base.py": (
        "Base LitePT on Structured3D",
        """_base_ = ["./semseg-litept-v1m1-0-small.py"]

model = dict(
    backbone=dict(
        enc_depths=(2, 2, 2, 2, 2),
        dec_depths=(2, 2, 2, 2),
    ),
)
""",
    ),
    "configs/structured3d/semseg-litept-v1m1-0-large.py": (
        "Large LitePT on Structured3D",
        """_base_ = ["./semseg-litept-v1m1-0-small.py"]

model = dict(
    backbone=dict(
        enc_depths=(2, 2, 2, 6, 2),
        enc_channels=(48, 96, 192, 384, 512),
        dec_depths=(2, 2, 2, 2),
        dec_channels=(64, 96, 192, 384),
    ),
)
""",
    ),
    "configs/structured3d/semseg-swin3d-v1m1-0-small.py": (
        "Swin3D small on Structured3D",
        """_base_ = ["../scannet/semseg-swin3d-v1m1-0-small.py"]

model = dict(num_classes=25, backbone=dict(in_channels=9))

dataset_type = "Structured3DDataset"
data_root = "data/structured3d"

data = dict(
    num_classes=25,
    names=[f"class_{i}" for i in range(25)],
    train=dict(type=dataset_type, data_root=data_root, split=("train", "test")),
    val=dict(type=dataset_type, data_root=data_root, split="val"),
    test=dict(type=dataset_type, data_root=data_root, split="val"),
)
""",
    ),
    "configs/structured3d/semseg-swin3d-v1m1-1-large.py": (
        "Swin3D large on Structured3D",
        """_base_ = ["./semseg-swin3d-v1m1-0-small.py"]

model = dict(
    backbone=dict(
        depths=(2, 4, 9, 4, 4),
        channels=(80, 160, 320, 640, 640),
        num_heads=(10, 10, 20, 40, 40),
    ),
)
""",
    ),
}

for path, (desc, body) in ONE_OFFS.items():
    fam_dir = os.path.basename(os.path.dirname(path))
    emit(path, header(fam_dir, os.path.basename(path), desc) + body)

# ======================================================================
# _base_/dataset fragments (reference keeps reusable data blocks here)
# ======================================================================
BASE_DATASETS = {
    "scannet": ("ScanNetDataset", "data/scannet", 20),
    "scannet200": ("ScanNet200Dataset", "data/scannet", 200),
    "scannetpp": ("ScanNetPPDataset", "data/scannetpp", 100),
    "s3dis": ("S3DISDataset", "data/s3dis", 13),
    "structured3d": ("Structured3DDataset", "data/structured3d", 25),
    "shapenet_part": ("ShapeNetPartDataset", "data/shapenetcore_partanno_segmentation_benchmark_v0_normal", 50),
    "partnete": ("PartNetEDataset", "data/partnete", 148),
}
for name, (dstype, root, nc) in BASE_DATASETS.items():
    body = f"""# Reusable {name} data block (parity: reference configs/_base_/dataset/{name}.py)

dataset_type = "{dstype}"
data_root = "{root}"

data = dict(
    num_classes={nc},
    ignore_index=-1,
    names=[f"class_{{i}}" for i in range({nc})],
    train=dict(type=dataset_type, split="train", data_root=data_root, test_mode=False),
    val=dict(type=dataset_type, split="val", data_root=data_root, test_mode=False),
    test=dict(type=dataset_type, split="val", data_root=data_root, test_mode=True),
)
"""
    emit(f"configs/_base_/dataset/{name}.py", body)


def _pyfmt(v):
    """python literal source for schedule values (dicts -> dict(...) calls)."""
    if isinstance(v, dict):
        items = ", ".join(f"{k}={_pyfmt(x)}" for k, x in v.items())
        return f"dict({items})"
    if isinstance(v, list):
        return "[" + ", ".join(_pyfmt(x) for x in v) + "]"
    return repr(v)


def apply_ref_schedules():
    """Append reference-extracted training schedules to emitted configs.

    `tools/ref_schedules.json` (built by tools/extract_ref_schedules.py from
    the reference tree) carries the resolved epoch/eval_epoch/optimizer/
    scheduler/param_dicts of every reference config sharing a relpath with an
    emitted file. Appending the resolved values (with `_delete_=True` on the
    dicts) makes the final merged schedule equal the reference's regardless of
    what the family recipe or `_base_` chain set above.
    """
    import json

    sched_path = os.path.join(REPO, "tools", "ref_schedules.json")
    if not os.path.exists(sched_path):
        print("no ref_schedules.json; skipping schedule parity injection")
        return
    with open(sched_path) as f:
        schedules = json.load(f)
    n = 0
    for rel in list(FILES):
        entry = schedules.get(rel)
        if not entry:
            continue
        lines = [
            "",
            "# --- training schedule: extracted from the reference config of the same",
            "# name (tools/ref_schedules.json via tools/extract_ref_schedules.py) ---",
        ]
        for key in ("epoch", "eval_epoch"):
            if entry.get(key) is not None:
                lines.append(f"{key} = {entry[key]}")
        for key in ("optimizer", "scheduler"):
            if entry.get(key) is not None:
                d = dict(entry[key])
                d.pop("_delete_", None)
                lines.append(f"{key} = dict(_delete_=True, " + _pyfmt(d)[5:])
        if "param_dicts" in entry:
            lines.append(f"param_dicts = {_pyfmt(entry['param_dicts'])}")
        FILES[rel] = FILES[rel].rstrip() + "\n" + "\n".join(lines) + "\n"
        n += 1
    print(f"injected reference schedules into {n} configs")


def main():
    import sys

    force = "--force" in sys.argv
    apply_ref_schedules()
    n_new = n_over = 0
    for rel, text in sorted(FILES.items()):
        path = os.path.join(REPO, rel)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        if os.path.exists(path):
            with open(path) as f:
                if f.read() == text:
                    continue
            if not force:
                print(f"skip (exists, differs — rerun with --force): {rel}")
                continue
            n_over += 1
        else:
            n_new += 1
        with open(path, "w") as f:
            f.write(text)
    print(f"wrote {n_new} new + {n_over} updated configs ({len(FILES)} planned)")


if __name__ == "__main__":
    main()

"""Registry parity: every name the reference registers must resolve here.

The lists below are frozen from /root/reference (Pointcept ~v1.7.0) so the
test stands alone; SURVEY.md §2 is the provenance.
"""

import pytest

pytestmark = pytest.mark.quick

REF_MODELS = [
    "DefaultSegmentor", "DefaultSegmentorV2", "DefaultLORASegmentorV2",
    "DINOEnhancedSegmentor", "DefaultClassifier",
    "SpUNet-v1m1", "SpUNet-v1m2", "SpUNet-v1m3",
    "MinkUNet14A", "MinkUNet34C", "MinkUNet101A",
    "PointTransformer-Seg26", "PointTransformer-Seg38", "PointTransformer-Seg50",
    "PointTransformer-Cls26", "PointTransformer-Cls38", "PointTransformer-Cls50",
    "PT-v2m1", "PT-v2m2", "PT-v2m3",
    "PT-v3m1", "PT-v3m2", "PT-v3m3",
    "ST-v1m1", "ST-v1m2", "SPVCNN", "OctFormer-v1m1", "Swin3D-v1m1",
    "OACNNs", "LitePT-v1",
    "PG-v1m1", "PG-v1m2", "SGIFormer-v1m1", "CAC-v1m1",
    "PPT-v1m1", "PPT-v1m2", "PPT-v1m3",
    "MSC-v1m1", "MSC-v1m2",
    "Sonata-v1m1", "Sonata-v1m2", "Sonata-v1m3",
    "Concerto-v1m1", "Concerto-v1m2_distill", "Utonia-v1m1",
]

REF_DATASETS = [
    "DefaultDataset", "ConcatDataset", "ScanNetDataset", "ScanNet200Dataset",
    "ScanNetPPDataset", "S3DISDataset", "Structured3DDataset",
    "ScanNetPairDataset", "HM3DDataset", "AEODataset", "MatterportDataset",
    "SemanticKITTIDataset", "NuScenesDataset", "WaymoDataset", "HKDataset",
    "ModelNetDataset", "ScanObjectNNDataset", "ScanObjectNNHardestDataset",
    "ScanObjectNNRawDataset", "ShapeNetPartDataset", "PartNetEDataset",
    "Cap3DDataset", "PartNetDataDataset",
    "DefaultImagePointDataset", "DefaultMultiViewImagePointDataset",
    "NuScenesImagePointDataset", "SemanticKITTIImagePointDataset",
    "WaymoImagePointDataset", "Cap3DImagePointDataset",
]

REF_TRANSFORMS = [
    "Collect", "Copy", "Update", "Add", "ToTensor", "NormalizeColor",
    "NormalizeCoord", "PositiveShift", "CenterShift", "RandomShift",
    "PointClip", "RandomDropout", "RandomRotate", "RandomRotateTargetAngle",
    "RandomScale", "RandomFlip", "RandomJitter", "ClipGaussianJitter",
    "ElasticDistortion", "ChromaticAutoContrast", "ChromaticTranslation",
    "ChromaticJitter", "RandomColorGrayScale", "RandomColorJitter",
    "HueSaturationTranslation", "RandomColorDrop", "RandomDropColor",
    "RandomDropNormal", "GridSample", "SphereCrop", "ShufflePoint",
    "CropBoundary", "ContrastiveViewsGenerator", "MultiViewGenerator",
    "InstanceParser",
]

REF_HOOKS = [
    "ModelHook", "IterationTimer", "InformationWriter", "CheckpointSaver",
    "CheckpointLoader", "PreciseEvaluator", "DataCacheOperator",
    "RuntimeProfiler", "RuntimeProfilerV2", "WeightDecaySchedular",
    "GarbageHandler", "SemSegEvaluator", "ClsEvaluator", "InsSegEvaluator",
]

REF_TESTERS = [
    "SemSegTester", "DINOSemSegTester", "ClsTester", "ClsVotingTester",
    "ShapeNetPartSegTester", "PartNetEPartSegTester", "InsSegTester",
]

REF_LOSSES = [
    "CrossEntropyLoss", "SmoothCELoss", "BinaryFocalLoss", "FocalLoss",
    "DiceLoss", "LovaszLoss",
]


def test_models_registry_covers_reference():
    from pointcept_tpu.models import MODELS

    missing = [n for n in REF_MODELS if n not in MODELS]
    assert missing == [], missing


def test_datasets_registry_covers_reference():
    from pointcept_tpu.datasets import DATASETS

    missing = [n for n in REF_DATASETS if n not in DATASETS]
    assert missing == [], missing


def test_transforms_registry_covers_reference():
    from pointcept_tpu.datasets.transform import TRANSFORMS

    missing = [n for n in REF_TRANSFORMS if n not in TRANSFORMS]
    assert missing == [], missing


def test_engine_registries_cover_reference():
    from pointcept_tpu.engines.hooks import HOOKS
    from pointcept_tpu.engines.test import TESTERS
    from pointcept_tpu.engines.train import TRAINERS
    from pointcept_tpu.models.losses import LOSSES

    assert [n for n in REF_HOOKS if n not in HOOKS] == []
    assert [n for n in REF_TESTERS if n not in TESTERS] == []
    for t in ("DefaultTrainer", "MultiDatasetTrainer", "PartialSampledTrainer"):
        assert t in TRAINERS
    assert [n for n in REF_LOSSES if n not in LOSSES] == []

from .builder import DATASETS, build_dataset
from .transform import TRANSFORMS, Compose, GridSample
from .defaults import DefaultDataset, ConcatDataset
from .utils import collate_fn, point_collate_fn, pad_to_point_batch
from .loader import DataLoader

from . import scannet  # noqa: F401
from . import s3dis  # noqa: F401
from . import modelnet  # noqa: F401
from . import synthetic  # noqa: F401
from . import semantic_kitti  # noqa: F401
from . import nuscenes  # noqa: F401
from . import waymo  # noqa: F401
from . import structured3d  # noqa: F401
from . import shapenet_part  # noqa: F401
from . import partnete  # noqa: F401
from . import image_transform  # noqa: F401
from . import image_point  # noqa: F401
from . import variants  # noqa: F401
from . import scannet_pair  # noqa: F401
from . import outdoor_image  # noqa: F401

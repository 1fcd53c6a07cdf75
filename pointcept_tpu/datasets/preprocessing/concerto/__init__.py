"""Concerto 2D-3D preprocessing exporters.

Parity: reference `pointcept/datasets/preprocessing/concerto/*` — per-dataset
pipelines that produce the posed-image + correspondence trees consumed by
`DefaultImagePointDataset` (`datasets/image_point.py`):

    <output>/<split>/<scene>/{coord,color,normal,...}.npy      point cloud
    <output>/images/<split>/<scene>/color/<i>.png              RGB frames
    <output>/images/<split>/<scene>/pose/<i>.npy               4x4 cam-to-world
    <output>/images/<split>/<scene>/intrinsic/<i>.npy|intrinsic.npy
    <output>/images/<split>/<scene>/correspondence/<i>.npy     [M,3] (x,y,point)
    <output>/splits/<split>.json                                manifest

Shared machinery lives in `common.py`; per-dataset raw parsers in their own
modules. The reference keeps ten near-identical `splits.py` scripts — here one
table-driven `write_splits` covers every dataset family.
"""

from pointcept_tpu.datasets.preprocessing.concerto.common import (  # noqa: F401
    depth_to_points,
    ground_plane_align,
    normal_from_grid,
    select_context_views,
    write_splits,
    zbuffer_correspondence,
)

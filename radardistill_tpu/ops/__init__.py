from . import geometry, nms, voxelize  # noqa: F401

from gp_compressor_tpu.geometry import patches, rotation, transforms, voxel  # noqa: F401

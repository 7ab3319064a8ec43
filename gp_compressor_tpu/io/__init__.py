from gp_compressor_tpu.io import artifact, pcd  # noqa: F401

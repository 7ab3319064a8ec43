from gp_compressor_tpu.parallel import mesh  # noqa: F401

from gp_compressor_tpu.workloads import compressor  # noqa: F401

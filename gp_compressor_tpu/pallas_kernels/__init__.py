from gp_compressor_tpu.pallas_kernels import sogp_train  # noqa: F401

from gp_compressor_tpu.ops import kernels, noise  # noqa: F401

from gp_compressor_tpu.utils import synthetic  # noqa: F401

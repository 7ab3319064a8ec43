from gp_compressor_tpu.inference import hmc, smc, vi  # noqa: F401

from gp_compressor_tpu.models import exact_gp, sparse_gp  # noqa: F401

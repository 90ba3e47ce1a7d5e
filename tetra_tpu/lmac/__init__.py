from tetra_tpu.lmac import pipeline  # noqa: F401

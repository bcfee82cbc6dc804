from mp_hsir_tpu.models.mp_hsir import MPHSIRNet  # noqa: F401

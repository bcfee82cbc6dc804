from mp_hsir_tpu.parallel.mesh import make_mesh, batch_pspec, DATA_AXIS, SPATIAL_AXIS  # noqa: F401

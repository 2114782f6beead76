from gstbad_tpu.elements.geometry import geometrictransform  # noqa: F401

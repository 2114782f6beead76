from gstbad_tpu.elements.cv import filters  # noqa: F401

from gstbad_tpu.elements.analysis import compare  # noqa: F401

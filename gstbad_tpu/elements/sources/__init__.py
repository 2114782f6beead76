from gstbad_tpu.elements.sources import testsrc  # noqa: F401

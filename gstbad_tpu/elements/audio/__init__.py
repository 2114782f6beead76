from gstbad_tpu.elements.audio import mixmatrix  # noqa: F401
from gstbad_tpu.elements.audio import freeverb  # noqa: F401
from gstbad_tpu.elements.audio import removesilence  # noqa: F401
from gstbad_tpu.elements.audio import buffersplit  # noqa: F401
from gstbad_tpu.elements.audio import meters  # noqa: F401
from gstbad_tpu.elements.audio import bs2b  # noqa: F401
from gstbad_tpu.elements.audio import webrtcdsp  # noqa: F401
from gstbad_tpu.elements.audio import pitch  # noqa: F401

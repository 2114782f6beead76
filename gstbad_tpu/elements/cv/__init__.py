from gstbad_tpu.elements.cv import filters  # noqa: F401
from gstbad_tpu.elements.cv import warp  # noqa: F401
from gstbad_tpu.elements.cv import detect  # noqa: F401
from gstbad_tpu.elements.cv import segmentation  # noqa: F401
from gstbad_tpu.elements.cv import handdetect  # noqa: F401
from gstbad_tpu.elements.cv import grabcutel  # noqa: F401
from gstbad_tpu.elements.cv import disparity  # noqa: F401
from gstbad_tpu.elements.cv import tracker  # noqa: F401

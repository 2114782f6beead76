from gstbad_tpu.elements.video import gaudieffects  # noqa: F401
from gstbad_tpu.elements.video import coloreffects  # noqa: F401
from gstbad_tpu.elements.video import videofilters  # noqa: F401
from gstbad_tpu.elements.video import videosignal  # noqa: F401
from gstbad_tpu.elements.video import bayer  # noqa: F401
from gstbad_tpu.elements.video import ivtc  # noqa: F401
from gstbad_tpu.elements.video import interlace  # noqa: F401
from gstbad_tpu.elements.video import convert  # noqa: F401

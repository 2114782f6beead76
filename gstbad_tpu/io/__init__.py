from gstbad_tpu.io import gdp  # noqa: F401
from gstbad_tpu.io import y4m  # noqa: F401
from gstbad_tpu.io import pnm  # noqa: F401
from gstbad_tpu.io import jpeg  # noqa: F401

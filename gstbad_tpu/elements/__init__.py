"""Element families.  Importing this package registers every element."""

from gstbad_tpu.elements import debugutils  # noqa: F401
from gstbad_tpu.elements import sources  # noqa: F401
from gstbad_tpu.elements import video  # noqa: F401
from gstbad_tpu.elements import geometry  # noqa: F401
from gstbad_tpu.elements import audio  # noqa: F401
from gstbad_tpu.elements import analysis  # noqa: F401
from gstbad_tpu.elements import observability  # noqa: F401
from gstbad_tpu.elements import bridges  # noqa: F401
from gstbad_tpu.io import shm as _shm_elements  # noqa: F401
from gstbad_tpu.io import ipcpipeline as _ipc_elements  # noqa: F401
from gstbad_tpu.elements import misc  # noqa: F401
from gstbad_tpu.elements import jaxfilter  # noqa: F401
from gstbad_tpu.elements import cv  # noqa: F401
from gstbad_tpu.elements import files  # noqa: F401
from gstbad_tpu.elements import kate  # noqa: F401
from gstbad_tpu.elements import pcap  # noqa: F401
from gstbad_tpu.elements import mpegts  # noqa: F401
from gstbad_tpu.elements import videoparsers  # noqa: F401
from gstbad_tpu.elements import jpegformat  # noqa: F401
from gstbad_tpu.elements import adaptivedemux  # noqa: F401
from gstbad_tpu.elements import ioelements  # noqa: F401
from gstbad_tpu.elements import asfmux  # noqa: F401
from gstbad_tpu.elements import mxf  # noqa: F401
from gstbad_tpu.elements import onvif  # noqa: F401
from gstbad_tpu.elements.audio import visualizers  # noqa: F401
from gstbad_tpu.elements import rfbsrc  # noqa: F401
from gstbad_tpu.elements import rtp  # noqa: F401
from gstbad_tpu.elements import sdpdemux  # noqa: F401

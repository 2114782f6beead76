from gstbad_tpu.session.play import Play, PlayState
from gstbad_tpu.session.transcoder import Transcoder
from gstbad_tpu.session.camera import Camera  # noqa: F401

from gstbad_tpu.session.play import (  # noqa: F401
    AudioInfo, MediaInfo, Play, PlayState, StreamInfo, SubtitleInfo,
    VideoInfo)
from gstbad_tpu.session.player import (  # noqa: F401
    DirectDispatcher, Player, QueuedDispatcher, SignalAdapter)
from gstbad_tpu.session.transcoder import Transcoder
from gstbad_tpu.session.camera import Camera  # noqa: F401

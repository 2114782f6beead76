from gstbad_tpu.core.spec import MediaSpec, VideoFormat, AudioFormat, BayerFormat
from gstbad_tpu.core.element import Element, VideoFilter, AudioFilter, Property
from gstbad_tpu.core.frame import FrameBatch
from gstbad_tpu.core.registry import register, make, element_names
from gstbad_tpu.core.pipeline import Pipeline, parse_launch
from gstbad_tpu.core.harness import Harness
from gstbad_tpu.core.bus import Bus, Message

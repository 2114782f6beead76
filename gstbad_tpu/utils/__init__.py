from gstbad_tpu.utils.trace import PipelineTracer, trace_to

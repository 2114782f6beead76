from gstbad_tpu.models.benchmarks import BENCHMARKS, build

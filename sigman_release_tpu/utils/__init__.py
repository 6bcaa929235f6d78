from sigman_release_tpu.utils.ply import save_ply, load_ply
from sigman_release_tpu.utils.logging import MetricLogger
from sigman_release_tpu.utils.profiling import StepTimer, trace_if
from sigman_release_tpu.utils.visualize import save_visualization

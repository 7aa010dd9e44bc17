from hammlet_tpu.samplers.forward_backward import fb_sample_states  # noqa: F401
from hammlet_tpu.samplers.mixture import mixture_sample_states  # noqa: F401
from hammlet_tpu.samplers.sweep import gibbs_sweep, SweepOutputs  # noqa: F401

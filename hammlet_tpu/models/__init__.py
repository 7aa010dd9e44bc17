from hammlet_tpu.models.hmm import HMMState, HMMPriors, ModelSpec  # noqa: F401
from hammlet_tpu.models.mapping import combinations_mapping  # noqa: F401

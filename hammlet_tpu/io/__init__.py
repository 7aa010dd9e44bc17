from hammlet_tpu.io.records import Records  # noqa: F401
from hammlet_tpu.io.input import read_values  # noqa: F401

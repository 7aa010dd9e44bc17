"""Post-processing toolkit for HaMMLET output (Python-3 re-creation of the
reference's bin/pyhammlet Python-2 package: io, RLE, plotting)."""

from hammlet_tpu.pyhammlet.rle import RunLengthArray, shatter, subdiff  # noqa: F401
from hammlet_tpu.pyhammlet.io import (  # noqa: F401
    readBlockSizes,
    readCompressedStateSequences,
    readMarginals,
)

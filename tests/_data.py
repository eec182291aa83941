"""Golden test-data locations.

The golden pair (two_string.fa / two_string.npy) is vendored in
``test_data/`` at the repo root so the suite is self-contained (the
reference keeps its copy in-repo the same way). ``MSBWT_REFERENCE_DATA``
overrides the directory, e.g. to re-check against the upstream originals.
"""

import os

_DEFAULT = os.path.join(os.path.dirname(__file__), os.pardir, "test_data")
DATA_DIR = os.path.abspath(os.environ.get("MSBWT_REFERENCE_DATA", _DEFAULT))

GOLDEN_FA = os.path.join(DATA_DIR, "two_string.fa")
GOLDEN_NPY = os.path.join(DATA_DIR, "two_string.npy")

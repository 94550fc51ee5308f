"""Model / loss / schedule layer (reference: src/core/)."""

from fsnerf_tpu.core.encoding import positional_encoding, freq_mask
from fsnerf_tpu.core.models import NeRF, SiNeRF, make_model

"""BFV scheme on RNS polynomial rings — TPU-native replacement for the
reference's `seal_fhe` crate + Microsoft SEAL C++ core (SURVEY.md §2.4).

Public surface: `BfvParams`, `BfvContext`/`get_context`, keygen in
`keys`, evaluator ops in `ops`, `BatchEncoder`.
"""

from sunscreen_tpu.bfv.context import BfvContext, get_context  # noqa: F401
from sunscreen_tpu.bfv.encoder import BatchEncoder  # noqa: F401
from sunscreen_tpu.bfv.params import BfvParams  # noqa: F401

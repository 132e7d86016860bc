"""Mirror AV1 decoder for the subset the encoder emits.

The reference ships only a decoder API stub (EbDecHandle.c, 22 LoC); this
package provides a working decoder for validation: e2e tests decode the
encoder's IVF output and require bit-exact reconstruction parity
(the role libaom plays in the reference's e2e suite, SURVEY.md §4.3).
"""

from svt_av1_tpu.decoder.decode import Decoder  # noqa: F401

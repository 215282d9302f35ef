"""Private transaction with a linked proof: deposit an encrypted amount
and prove — without revealing it — that the amount is well-formed
(validly encrypted, in range, and equal to a committed total)
(reference: `examples/private_tx_linkedproof`, the SMART-FHE flow)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sunscreen_tpu.bfv import BfvParams  # noqa: E402
from sunscreen_tpu.runtime import Runtime  # noqa: E402
from sunscreen_tpu.runtime.linked import LogProofBuilder  # noqa: E402
from sunscreen_tpu.types import Unsigned64  # noqa: E402
from sunscreen_tpu.types.zkp_types import (Field, Private,  # noqa: E402
                                           zkp_program)

PARAMS = BfvParams.insecure(poly_degree=64, limbs=1, limb_bits=28)
MAX_TX_BITS = 16


@zkp_program()
def valid_deposit(amount: Private[Field]):
    # the deposit fits in 16 bits (no overflow games) and is non-zero
    amount.to_unsigned(MAX_TX_BITS)
    amount.inverse()


def main():
    rt = Runtime.new_fhe_zkp(PARAMS)
    pub, priv = rt.generate_keys(seed=0, galois=False, relin=False)

    # Alice deposits 1337 encrypted; the chain learns only the proof
    builder = LogProofBuilder(rt)
    ct, link = builder.encrypt_returning_link(Unsigned64(1337), pub,
                                              seed=42)
    proof = builder.build_linked(valid_deposit)

    # the verifier (chain) checks: ciphertext is a valid encryption of
    # SOME value, and that value satisfies the zkp circuit. It pins
    # WHICH statement message the circuit input is linked to.
    assert proof.verify(valid_deposit,
                        expected_message_ids=[link.message_id])
    print("deposit proof verified: ciphertext validly encrypts a "
          "nonzero <2^16 amount (amount stays hidden)")

    # the bank can still process the encrypted amount
    assert rt.decrypt(ct, priv) == 1337
    print("bank decrypts deposit: 1337")


if __name__ == "__main__":
    main()

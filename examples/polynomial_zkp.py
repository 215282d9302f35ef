"""ZKP: prove knowledge of a root of a public polynomial (reference:
`examples/polynomial_zkp` — evaluate polynomial over private input)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sunscreen_tpu.runtime import Runtime  # noqa: E402
from sunscreen_tpu.types.zkp_types import (Field, Private,  # noqa: E402
                                           Public, zkp_program)

# p(x) = x^3 - 6x^2 + 11x - 6 = (x-1)(x-2)(x-3)
COEFFS = [-6, 11, -6, 1]  # little-endian


@zkp_program()
def knows_root(x: Private[Field]):
    acc = None
    power = None
    for i, c in enumerate(COEFFS):
        term = Field._lift(c) if i == 0 else power * c
        acc = term if acc is None else acc + term
        power = x if power is None else power * x
    acc.constrain_zero()


def main():
    rt = Runtime.new_zkp()
    for root in (1, 2, 3):
        proof = rt.prove(knows_root, [root])
        assert rt.verify(knows_root, proof)
    print("proofs for all three hidden roots verified")
    try:
        rt.prove(knows_root, [4])
        raise SystemExit("should have failed")
    except Exception:
        print("non-root correctly rejected")


if __name__ == "__main__":
    main()

"""ZKP: prove one private value is less than another via binary range
decomposition (reference: `examples/ordering_zkp`)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sunscreen_tpu.runtime import Runtime  # noqa: E402
from sunscreen_tpu.types.zkp_types import (Field, Private,  # noqa: E402
                                           Public, zkp_program)

BITS = 16


@zkp_program()
def less_than(a: Private[Field], b: Public[Field]):
    # b - a - 1 must be representable in BITS bits (i.e. a < b)
    diff = b - a - 1
    diff.to_unsigned(BITS)
    # and a itself is in range
    a.to_unsigned(BITS)


def main():
    rt = Runtime.new_zkp()
    proof = rt.prove(less_than, [37], public_inputs=[100])
    assert rt.verify(less_than, proof, public_inputs=[100])
    print("proved hidden value < 100")
    try:
        rt.prove(less_than, [101], public_inputs=[100])
        raise SystemExit("should have failed")
    except Exception:
        print("101 < 100 correctly unprovable")


if __name__ == "__main__":
    main()

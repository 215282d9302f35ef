"""ZKP: prove a private value lies in an allowlist without revealing it
(reference: `examples/allowlist_zkp` — constrain prod(x - i) == 0 over
the list)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from sunscreen_tpu.runtime import Runtime  # noqa: E402
from sunscreen_tpu.types.zkp_types import (Field, Private,  # noqa: E402
                                           zkp_program)

ALLOWLIST = list(range(100, 120))


@zkp_program()
def allowlist(entry: Private[Field]):
    acc = entry - ALLOWLIST[0]
    for v in ALLOWLIST[1:]:
        acc = acc * (entry - v)
    acc.constrain_zero()


def main():
    rt = Runtime.new_zkp()
    proof = rt.prove(allowlist, [101])
    assert rt.verify(allowlist, proof)
    print("membership proof for hidden value verified "
          f"(list size {len(ALLOWLIST)})")
    try:
        rt.prove(allowlist, [99])
        raise SystemExit("should have failed")
    except Exception:
        print("non-member correctly cannot produce a proof")


if __name__ == "__main__":
    main()

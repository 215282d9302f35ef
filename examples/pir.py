"""Private information retrieval: fetch a database row without
revealing the index (reference: `examples/pir` — selector-vector dot
product over Batched lanes)."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np  # noqa: E402

from sunscreen_tpu.compiler import Compiler, fhe_program  # noqa: E402
from sunscreen_tpu.runtime import Runtime  # noqa: E402
from sunscreen_tpu.types import Batched, Cipher  # noqa: E402

DB_SIZE = 8


@fhe_program(scheme="bfv")
def lookup(selector: Cipher[Batched], db: Cipher[Batched]):
    """selector is a one-hot row; sum(selector * db) lands the chosen
    item in every lane of the result's first block."""
    prod = selector * db
    acc = prod
    steps = 1
    for _ in range(3):  # log2(DB_SIZE) rotation-adds
        acc = acc + (acc << steps)
        steps *= 2
    return acc


def main():
    app = Compiler().fhe_program(lookup).compile()
    rt = Runtime.new_fhe(app.params)
    pub, priv = rt.generate_keys()
    n = app.params.poly_degree
    database = [101, 202, 303, 404, 505, 606, 707, 808]
    want_idx = 5

    db = np.zeros(n, dtype=np.int64)
    db[:DB_SIZE] = database
    sel = np.zeros(n, dtype=np.int64)
    sel[want_idx] = 1

    c_sel = rt.encrypt(Batched(sel), pub)   # the query hides the index
    c_db = rt.encrypt(Batched(db), pub)
    (res,) = rt.run(app.get_program(lookup), [c_sel, c_db], pub)
    got = rt.decrypt(res, priv)
    print(f"PIR fetched db[{want_idx}] = {got[0]} "
          f"(expect {database[want_idx]})")
    assert got[0] == database[want_idx]


if __name__ == "__main__":
    main()

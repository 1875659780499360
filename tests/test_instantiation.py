"""``EmailAddress::new`` analog conformance — mirrors the reference's
generated instantiation suites (rust-lib/build.rs:283-360):

* positive: valid local x valid domain constructs, keeps the CALLER's
  parts verbatim;
* negative strict: error is exactly "Invalid local part '{local}'."
  regardless of which side is at fault (email_address.rs:265-267);
* negative lax: NEVER fails — constructs the unvalidated pair
  (email_address.rs:268-272).
"""

import numpy as np
import pyarrow as pa

from email_address_parser_ray.functions import corpus as C
from email_address_parser_ray.functions.fastpath import validate_pairs_batch
from email_address_parser_ray.functions.grammar import make_address


def _cases():
    return C.cartesian_cases(C.load_corpus())


def test_make_address_positive_and_negative_strict():
    cart = _cases()
    exp = cart["expected_valid_strict"].to_pylist()
    for i in range(cart.num_rows):
        lp = cart["local_part"][i].as_py()
        dom = cart["domain"][i].as_py()
        parsed, err = make_address(lp, dom, is_lax=False)
        if exp[i]:
            assert err is None
            assert parsed.local == lp and parsed.domain == dom  # caller's parts
            assert parsed.address == f"{lp}@{dom}"
        else:
            assert parsed is None
            assert err == f"Invalid local part '{lp}'."


def test_make_address_lax_never_fails():
    cart = _cases()
    exp = cart["expected_valid_strict"].to_pylist()
    neg = [i for i, e in enumerate(exp) if not e][:50]
    for i in neg:
        lp = cart["local_part"][i].as_py()
        dom = cart["domain"][i].as_py()
        parsed, err = make_address(lp, dom, is_lax=True)
        assert err is None
        assert parsed is not None and parsed.local == lp and parsed.domain == dom


def test_validate_pairs_batch_matches_scalar():
    cart = _cases()
    out = validate_pairs_batch(
        cart.select(["case_id", "local_part", "domain"])
    )
    exp = np.array(cart["expected_valid_strict"].to_pylist())
    got = np.array(out["new_ok"].to_pylist())
    assert (got == exp).all()
    errs = out["new_error"].to_pylist()
    for i in np.flatnonzero(~exp):
        assert errs[i] == f"Invalid local part '{cart['local_part'][int(i)].as_py()}'."
    for i in np.flatnonzero(exp):
        assert errs[i] is None


def test_pairwise_f1_combinatorics():
    import pandas as pd

    from email_address_parser_ray.functions.evalmetrics import pairwise_f1

    # 2 gold entities {a,b,c} {d,e}; prediction merges wrongly: {a,b} {c,d,e}
    df = pd.DataFrame(
        {
            "address": list("abcde"),
            "entity_id": [1, 1, 1, 2, 2],
            "cluster_id": ["x", "x", "y", "y", "y"],
        }
    )
    m = pairwise_f1(df)
    # gold pairs: C(3,2)+C(2,2)=4; pred pairs: C(2,2)+C(3,2)=4
    # tp: pairs together in both = (a,b) + (d,e) = 2
    assert m["tp"] == 2 and m["fp"] == 2 and m["fn"] == 2
    assert abs(m["f1"] - 0.5) < 1e-9

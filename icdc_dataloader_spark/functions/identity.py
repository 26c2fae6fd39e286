"""Identity synthesis: UUIDv5, node signatures, props signatures.

Reference semantics:

- ``get_uuid(domain, node_type, signature)`` (bento.common.utils, used at
  icdc_schema.py:119-128) is a three-level UUIDv5 chain rooted at
  ``NAMESPACE_URL``::

      uuid5(uuid5(uuid5(NAMESPACE_URL, domain), node_type), signature)

  Verified against the pinned value in reference tests/test_loader.py:65-66
  (``{type: case, case_id: '123'}`` under domain ``caninecommons.cancer.gov``
  -> ``f0cf40a7-3cdb-51fe-a596-e29e40123f56``).

- ``get_signature`` (data_loader.py:491-497): sorted non-parent-pointer
  ``key: value`` pairs formatted ``{ k1: v1, k2: v2 }`` (``{  }`` if empty).

- ``get_props_signature`` (data_loader.py:128-135): same, but values of
  relationship-property keys (containing ``$``) are masked to ``''`` and the
  result is md5-hashed — used for duplicate-ID benign/ error discrimination.

Spark side: a pandas (Arrow) UDF computes uuid5 via direct sha1 (no
``uuid`` object churn) with per-batch memoization of the type-level
namespace; signatures are built as native concat expressions.
"""

from __future__ import annotations

import hashlib
import re
import uuid

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

PARENT_POINTER_RE = re.compile(r"^\w+\.\w+$")  # icdc_schema.py:39-40


def is_parent_pointer(key: str) -> bool:
    return bool(PARENT_POINTER_RE.fullmatch(key))


def _uuid5_bytes(ns_bytes: bytes, name: str) -> bytes:
    h = hashlib.sha1(ns_bytes + name.encode("utf-8")).digest()[:16]
    b = bytearray(h)
    b[6] = (b[6] & 0x0F) | 0x50
    b[8] = (b[8] & 0x3F) | 0x80
    return bytes(b)


def _fmt(b: bytes) -> str:
    h = b.hex()
    return f"{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:]}"


def get_uuid(domain: str, node_type: str, signature: str) -> str:
    """Pure-Python reference ``get_uuid`` — oracle-side ground truth."""
    ns = uuid.NAMESPACE_URL.bytes
    ns = _uuid5_bytes(ns, domain)
    ns = _uuid5_bytes(ns, node_type)
    return _fmt(_uuid5_bytes(ns, str(signature)))


def make_uuid5_udf(domain: str):
    """Vectorized uuid5: (node_type, signature) -> uuid string.

    Memoizes the domain+type namespace per Arrow batch so the per-row work is
    a single sha1 over 16+len(sig) bytes.
    """
    domain_ns = _uuid5_bytes(uuid.NAMESPACE_URL.bytes, domain)

    @F.pandas_udf(T.StringType())
    def uuid5_udf(node_type: pd.Series, signature: pd.Series) -> pd.Series:
        type_ns: dict = {}

        def one(nt, sig):
            if sig is None:
                return None
            ns = type_ns.get(nt)
            if ns is None:
                ns = type_ns[nt] = _uuid5_bytes(domain_ns, nt)
            return _fmt(_uuid5_bytes(ns, str(sig)))

        return pd.Series(
            [one(nt, sig) for nt, sig in zip(node_type, signature)], dtype="object"
        )

    return uuid5_udf


def uuid5_expr(domain: str, node_type: str, sig_col: Column) -> Column:
    """Fully JVM-native uuid5 (no Python in the loop, unlike the pandas UDF).

    RFC-4122 v5 = sha1(namespace_bytes || utf8(name)) truncated to 16 bytes
    with the version nibble forced to 5 and the variant nibble to 10xx.  The
    two outer levels of the reference's 3-level chain (domain, node_type —
    bento.common.utils get_uuid, icdc_schema.py:119-128) are constants, so
    they are pre-computed driver-side; only the innermost sha1 runs per row,
    as a Catalyst expression inside whole-stage codegen:

        sha1(lit(ns2_bytes) ++ encode(sig)) -> hex -> splice version/variant.

    The variant nibble map (x & 0x3 | 0x8) is a 16-char translate().
    """
    ns2 = _uuid5_bytes(_uuid5_bytes(uuid.NAMESPACE_URL.bytes, domain), node_type)
    h = F.sha1(F.concat(F.lit(ns2), F.encode(sig_col.cast("string"), "utf-8")))
    variant = F.translate(
        F.substring(h, 17, 1), "0123456789abcdef", "89ab89ab89ab89ab"
    )
    return F.concat_ws(
        "-",
        F.substring(h, 1, 8),
        F.substring(h, 9, 4),
        F.concat(F.lit("5"), F.substring(h, 14, 3)),
        F.concat(variant, F.substring(h, 18, 3)),
        F.substring(h, 21, 12),
    )


def get_signature(node: dict) -> str:
    """Reference get_signature (data_loader.py:491-497)."""
    result = []
    for key in sorted(node.keys()):
        if not is_parent_pointer(key):
            result.append("{}: {}".format(key, node[key]))
    return "{{ {} }}".format(", ".join(result))


def get_props_signature(props: dict, rel_prop_delimiter: str = "$") -> str:
    """Reference get_props_signature (data_loader.py:128-135): mask rel props, md5."""
    sig = {
        k: ("" if rel_prop_delimiter in k else v) for k, v in sorted(props.items())
    }
    return hashlib.md5(str(sig).encode("utf-8")).hexdigest()


def signature_expr(columns: list[str]) -> Column:
    """Native expression producing reference get_signature over named columns.

    ``None`` values render as the literal string ``None`` (Python str.format
    semantics).  Parent-pointer columns must be excluded by the caller
    (the reference filters them, data_loader.py:495).
    """
    parts = [
        F.concat(
            F.lit(f"{c}: "), F.coalesce(F.col(c).cast("string"), F.lit("None"))
        )
        for c in sorted(columns)
    ]
    if not parts:
        return F.lit("{  }")
    return F.concat(F.lit("{ "), F.concat_ws(", ", *parts), F.lit(" }"))


def props_signature_expr(columns: list[str], rel_prop_delimiter: str = "$") -> Column:
    """Native md5 props-signature (data_loader.py:128-135 analogue).

    Used by duplicate-ID detection (V5): same id + same signature = benign
    multi-parent row; different signature = error.
    """
    parts = []
    for c in sorted(columns):
        if rel_prop_delimiter in c:
            parts.append(F.lit(f"'{c}': ''"))
        else:
            parts.append(
                F.concat(
                    F.lit(f"'{c}': '"),
                    F.coalesce(F.col(c).cast("string"), F.lit("None")),
                    F.lit("'"),
                )
            )
    body = F.concat_ws(", ", *parts) if parts else F.lit("")
    return F.md5(F.concat(F.lit("{"), body, F.lit("}")))

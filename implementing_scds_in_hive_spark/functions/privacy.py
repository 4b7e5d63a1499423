"""PII scrubbing for training corpora: redaction and pseudonymization.

Training-data pipelines scrub personally-identifying strings before
anything else touches the text. Two complementary tools:

* ``redact_pii`` — in-place masking of email addresses, phone-like
  number runs, and IPv4 addresses with fixed placeholder tokens.
  Pure ``regexp_replace`` chains: JVM-side, zero shuffle, pushes
  through any plan. Patterns deliberately use the common subset of
  Java regex (Spark) and RE2 (DuckDB) — no backreferences, no
  lookaround — so cross-engine oracles replay them verbatim.
* ``pseudonymize`` — replace an identifier column with a salted
  content-addressed token (portable md5-prefix hash, the same family
  as operators/sampling.py): stable across runs and engines (joins on
  the pseudonym still work), irreversible without the salt, and
  per-row with no shuffle.

Recall/precision of the regexes is the usual trade-off (a phone regex
will also hit order numbers); real deployments layer an NER model via
mapInPandas on top — the regex tier is the cheap, deterministic
backstop that needs no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from implementing_scds_in_hive_spark.operators.dedup import portable_token_hash

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
# 7+ digit runs, optionally separated by spaces/dashes/dots, with an
# optional leading +country: long enough to skip years/quantities.
PHONE_RE = r"\+?[0-9][0-9 .\-]{5,}[0-9]"


def redact_pii(text: Column) -> Column:
    """Mask emails, IPv4 addresses, and phone-like digit runs with
    placeholder tokens (order matters: emails first so their digits
    are not half-eaten by the phone pass, IPs before phones so dotted
    quads don't read as phone numbers)."""
    out = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, IPV4_RE, "<IP>")
    out = F.regexp_replace(out, PHONE_RE, "<PHONE>")
    return out


def pseudonymize(ident: Column, salt: str) -> Column:
    """Salted stable pseudonym for an identifier: 60-bit portable hash
    rendered as a fixed-width hex token. Same (salt, value) → same
    pseudonym on any engine; different salts are unlinkable."""
    return F.lpad(
        F.hex(portable_token_hash(F.concat(F.lit(salt), ident.cast("string")))),
        16,
        "0",
    )

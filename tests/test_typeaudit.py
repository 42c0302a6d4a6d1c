"""Wire-type audit as a permanent gate: the driver's value-hash is
type-sensitive through pandas (round-4 red rows: Spark DECIMAL surfaced
as Decimal objects vs DuckDB DECIMAL/HUGEINT as float64 on identical
values). test_entry_contract's normalizer is deliberately
type-INsensitive, so this test adds the missing dimension — every
oracled query's Spark schema must map to the same pandas wire kind as
DuckDB's DESCRIBE of its oracle."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_every_oracle_is_wire_type_clean(spark):
    from scripts.typeaudit import audit

    assert audit(spark=spark) == 0, "see typeaudit FLAG lines above"

"""Principal-scoped access policies — the engine-side analog of the
reference's LakeFormation grant stack (SURVEY §2.6 D8).

The reference grants principals database- and table-level permissions via
``aws_lakeformation.CfnPrincipalPermissions`` (reference:
web-analytics-iceberg/cdk_stacks/lake_formation.py:28-73 — CREATE_TABLE/
DROP/ALTER/DESCRIBE on the database, SELECT/INSERT/DELETE/DESCRIBE/ALTER
with table_wildcard on tables). Round 1 scoped this out as pure infra; this
module closes the gap with the QUERY-SEMANTIC part of that surface —
the same grant model extended to what LakeFormation calls
``TableWithColumns`` resources and data filters:

- permission grants per (principal, table): SELECT / INSERT / DELETE / …
- column allow-lists (column-level SELECT)
- deterministic column masks (hash / null / partial — LF data-cell masking)
- row filters (LF data filter ``row_filter`` expressions)

Enforcement happens at PLAN BUILD TIME: ``apply`` rewrites the logical plan
into ``filter(row_filter) → project(allowed, masked)``, so Catalyst still
pushes predicates and prunes columns *beneath* the policy — at 100 TB a
policy costs nothing beyond the mask expressions themselves (the row filter
typically reaches the parquet scan as a pushed filter). Nothing is
materialized per-principal.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

#: Permission vocabulary (mirrors the reference's table grant list).
PERMISSIONS = frozenset(
    {"SELECT", "INSERT", "DELETE", "DESCRIBE", "ALTER", "DROP", "CREATE_TABLE"}
)

#: Supported mask kinds for data-cell masking.
MASKS = frozenset({"sha256", "null", "partial"})


@dataclass(frozen=True)
class Grant:
    """One principal's permissions on one table (≅ one
    ``CfnPrincipalPermissions`` resource, plus LF data-filter fields)."""

    principal: str
    table: str
    permissions: frozenset[str]
    columns: tuple[str, ...] | None = None  # None → all columns
    masked: tuple[tuple[str, str], ...] = ()  # (column, mask-kind)
    row_filter: str | None = None  # SQL boolean expression

    def __post_init__(self) -> None:
        bad = self.permissions - PERMISSIONS
        if bad:
            raise ValueError(f"unknown permissions: {sorted(bad)}")
        for col, kind in self.masked:
            if kind not in MASKS:
                raise ValueError(f"unknown mask kind {kind!r} for column {col!r}")
        if self.columns is not None:
            leaked = [c for c, _ in self.masked if c not in self.columns]
            if leaked:
                raise ValueError(f"mask on non-granted columns: {leaked}")


def _mask_expr(col: str, kind: str):
    if kind == "sha256":
        # Deterministic pseudonymization: joins/count-distincts still work
        # across queries, raw identity never leaves the policy boundary.
        return F.sha2(F.col(col).cast("string"), 256).alias(col)
    if kind == "null":
        return F.lit(None).cast("string").alias(col)
    # partial: keep a 2-char prefix, redact the rest (strings only).
    return F.concat(
        F.substring(F.col(col).cast("string"), 1, 2), F.lit("***")
    ).alias(col)


class PolicyCatalog:
    """In-engine grant registry + plan-rewrite enforcement point."""

    def __init__(self) -> None:
        self._grants: dict[tuple[str, str], Grant] = {}

    def grant(
        self,
        principal: str,
        table: str,
        permissions: set[str] | frozenset[str] = frozenset({"SELECT"}),
        columns: tuple[str, ...] | list[str] | None = None,
        masked: dict[str, str] | None = None,
        row_filter: str | None = None,
    ) -> Grant:
        g = Grant(
            principal=principal,
            table=table,
            permissions=frozenset(permissions),
            columns=tuple(columns) if columns is not None else None,
            masked=tuple(sorted((masked or {}).items())),
            row_filter=row_filter,
        )
        self._grants[(principal, table)] = g
        return g

    def revoke(self, principal: str, table: str) -> None:
        self._grants.pop((principal, table), None)

    def grants_for(self, principal: str) -> list[Grant]:
        return [g for (p, _), g in self._grants.items() if p == principal]

    def check(self, principal: str, table: str, permission: str) -> Grant:
        """Raise ``PermissionError`` unless the grant exists and carries
        ``permission`` (DESCRIBE is implied by any grant, as in LF)."""
        g = self._grants.get((principal, table))
        if g is None:
            raise PermissionError(f"{principal} has no grant on {table}")
        if permission != "DESCRIBE" and permission not in g.permissions:
            raise PermissionError(
                f"{principal} lacks {permission} on {table} "
                f"(has {sorted(g.permissions)})"
            )
        return g

    def apply(self, df: DataFrame, principal: str, table: str) -> DataFrame:
        """Enforce the principal's SELECT grant over ``df``: row filter →
        column allow-list → cell masks, as a plain plan rewrite (Catalyst
        optimizes through it)."""
        g = self.check(principal, table, "SELECT")
        out = df
        if g.row_filter:
            out = out.filter(F.expr(g.row_filter))
        cols = list(g.columns) if g.columns is not None else out.columns
        missing = [c for c in cols if c not in out.columns]
        if missing:
            raise PermissionError(f"granted columns absent from table: {missing}")
        masks = dict(g.masked)
        leaked = [c for c in masks if c not in cols]
        if leaked:
            raise ValueError(f"mask on non-granted columns: {leaked}")
        return out.select(
            *[_mask_expr(c, masks[c]) if c in masks else F.col(c) for c in cols]
        )

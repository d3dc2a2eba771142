"""The reference's upstream anonymization job
(/root/reference/src/Criptografia.py) as an engine pipeline.

Reference flow: CSV read (inferSchema, ISO-8859-1, ';') → upper/trim
cleanup → CPF null-sentinel + '.0'-suffix strip → sha2(concat(main,
secondary), 256) IDs for patient (CPF+Name) and doctor (Name) →
32-column select → toPandas().to_csv (a Windows/Hadoop workaround).

Differences here: generic column specs instead of hard-coded names,
optional salt, native distributed writers (no driver collect), and the
identifying source columns dropped by default.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..functions.crypto import sha256_hex


@dataclass
class PseudonymSpec:
    """One pseudonymous ID derivation (Criptografia.py:12-42):
    sha2-256 over main+secondary columns."""

    out_col: str
    main_col: str
    secondary_col: str | None = None
    null_sentinel: str | None = None  # e.g. 'CPF_NULO' (Criptografia.py:75-78)
    strip_float_suffix: bool = False  # drop trailing '.0' (Criptografia.py:79-80)
    drop_sources: tuple[str, ...] = field(default_factory=tuple)


def clean_identifier(
    col: F.Column,
    null_sentinel: str | None,
    strip_float_suffix: bool,
    dtype: str | None = None,
) -> F.Column:
    # numeric-inferred identifiers (CSV inferSchema turns '123.0' CPFs
    # into doubles) must not stringify as scientific notation — the
    # reference's cast('string') does exactly that for CPFs > 1e7
    # (Criptografia.py:79, latent bug); a decimal cast keeps digits
    c = col.cast("decimal(30,1)").cast("string") if dtype in ("double", "float") else col.cast("string")
    if strip_float_suffix:
        c = F.regexp_replace(c, r"\.0$", "")
    if null_sentinel is not None:
        c = F.coalesce(c, F.lit(null_sentinel))
    return c


def pseudonymize_table(
    df: DataFrame, specs: list[PseudonymSpec], salt: str | None = None
) -> DataFrame:
    """Apply every spec; drop the identifying sources afterwards."""
    drops: list[str] = []
    dtypes = dict(df.dtypes)
    for s in specs:
        main = clean_identifier(
            F.col(s.main_col), s.null_sentinel, s.strip_float_suffix, dtypes.get(s.main_col)
        )
        parts = [main]
        if s.secondary_col:
            parts.append(F.upper(F.trim(F.col(s.secondary_col))))
        df = df.withColumn(s.out_col, sha256_hex(*parts, salt=salt))
        drops.extend(s.drop_sources)
    return df.drop(*set(drops)) if drops else df


# The reference job's exact derivations (Criptografia.py:114-126)
REFERENCE_SPECS = [
    PseudonymSpec(
        out_col="ID_Paciente_Anon",
        main_col="Pacientes_CPF",
        secondary_col="Pacientes_Nome",
        null_sentinel="CPF_NULO",
        strip_float_suffix=True,
        drop_sources=("Pacientes_CPF", "Pacientes_Nome"),
    ),
    PseudonymSpec(
        out_col="ID_Medico_Anon",
        main_col="Nome_Medico",
        drop_sources=("Nome_Medico",),
    ),
]


def run_pseudonymization(
    spark,
    input_csv: str,
    output_path: str,
    specs: list[PseudonymSpec] | None = None,
    salt: str | None = None,
    csv_export: bool = False,
) -> DataFrame:
    """End-to-end replacement for `python src/Criptografia.py`: tolerant
    CSV ingest → pseudonymize → parquet (native writer — no
    toPandas collect; Criptografia.py:172-183 collects the whole table
    to the driver, which caps the job at driver RAM)."""
    from ..sources.csv_tolerant import read_csv_tolerant
    from ..sources.sinks import write_csv_pbi, write_parquet

    df = read_csv_tolerant(spark, input_csv)
    out = pseudonymize_table(df, specs or REFERENCE_SPECS, salt=salt)
    write_parquet(out, f"{output_path}/base_anonima.parquet")
    if csv_export:
        write_csv_pbi(out, f"{output_path}/base_anonima.csv_dir")
    return out

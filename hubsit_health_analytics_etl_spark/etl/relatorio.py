"""Formatted stdout reports — the human-readable print edge of the
reference pipeline (`formatar_relatorio` and the five analysis blocks,
/root/reference/src/etl_pipeline.py:304-459), re-expressed over the
Spark fact table produced by :func:`..etl.appointments.preprocess`.

Every report is a distributed aggregate (single `agg`/`groupBy` pass,
Catalyst-fused) whose TINY result (scalars or a handful of group rows)
is collected to the driver purely for text rendering — the only
driver-side work is string formatting, so the edge is scale-free.

Deliberate differences from the reference, both documented in
``appointments.py``: ``as_of`` injection (no wall clock) and plain
string ``Faixa_Etaria`` (a distributed aggregate only reports observed
groups; pandas' categorical crosstab also emits zero-count unobserved
age bands, which carry no information for the report).
"""

from __future__ import annotations

from functools import reduce

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from ..operators.aggregate import count_if, sum_if

# etl_pipeline.py:326-331 — the critical columns of the missing-data audit
COLUNAS_CRITICAS = [
    "Agendamento Inicio",
    "Data_Marcacao",
    "Valor",
    "Unidade",
    "Procedimento",
    "ID_Medico_Anon",
    "ID_Paciente_Anon",
    "Categoria_Servico_Limpa",
    "Pacientes_Sexo",
    "Pacientes_DataNascimento",
    "Pacientes_Indicacao",
    "Confirmacoes_Data_Confirmacao",
    "Atendimentos_DataEHora_Chegada",
    "Cancelamentos_DataDeCancelamento",
]

# etl_pipeline.py:341 — categoricals where the 'Indefinido' sentinel
# counts as missing
_INDEFINIDO_AS_NULL = {
    "Pacientes_Sexo",
    "Pacientes_Indicacao",
    "Faixa_Etaria",
    "Categoria_Servico_Limpa",
}

# etl_pipeline.py:396-401 — status → simple label for the no-show profile
_MAPA_STATUS = {
    "ATENDIDO": "Realizado",
    "NO-SHOW": "No-Show",
    "CANCELADO": "Cancelado",
    "CANCELAMENTO_TARDIO": "Cancelado",
}

_PROFILE_DIMS = [
    ("Pacientes_Sexo", "SEXO"),
    ("Faixa_Etaria", "FAIXA ETARIA"),
    ("Pacientes_Indicacao", "INDICACAO"),
]


def formatar_relatorio(titulo: str, dados) -> str:
    """Text frame around one report block — byte-identical output
    contract to the reference helper (etl_pipeline.py:304-314), pinned
    by a golden test, re-expressed over the shapes this module's
    collected results actually take: a mapping renders as ``k: v``
    lines, anything else through ``str``. (The reference also
    dispatched on pandas frames; this engine renders its tabular
    blocks from collected rows before framing, so no pandas type
    check belongs here.)"""
    corpo = (
        "".join(f"{k}: {v}\n" for k, v in dados.items())
        if isinstance(dados, dict)
        else str(dados)
    )
    return f"\n--- {titulo} ---\n{corpo}\n{'-' * (len(titulo) + 6)}\n"


def _header(titulo: str) -> str:
    return "\n" + "=" * 70 + f"\n {titulo}\n" + "=" * 70


def relatorio_dados_faltantes(df: DataFrame) -> str:
    """Missing-data audit (etl_pipeline.py:316-361): per-column missing
    counts over the critical columns, 'Indefinido' counted as missing
    for the categorical ones. The reference loops one full-table scan
    per column; here ONE aggregate pass computes every counter."""
    cols = [c for c in COLUNAS_CRITICAS if c in df.columns]

    def _missing(c: str) -> F.Column:
        cond = F.col(c).isNull()
        if c in _INDEFINIDO_AS_NULL:
            cond = cond | (F.col(c) == "Indefinido")
        return count_if(cond).alias(c)

    row = df.agg(F.count(F.lit(1)).alias("_total"), *[_missing(c) for c in cols]).first()
    total = row["_total"] or 1

    faltantes = pd.DataFrame(
        [
            {
                "Campo": c,
                "Registros_Vazios": int(row[c]),
                "Percentual": round(row[c] / total * 100, 2),
            }
            for c in cols
        ]
    )
    out = [_header("ANALISE DE QUALIDADE DOS DADOS - DADOS FALTANTES")]
    out.append("\nCampos com Dados Faltantes:")
    out.append("-" * 70)
    com_falta = faltantes[faltantes["Registros_Vazios"] > 0]
    if len(com_falta) > 0:
        out.append(com_falta.to_string(index=False))
        out.append(
            f"\n[!] ALERTA: {len(com_falta)} campos criticos possuem dados faltantes!"
        )
    else:
        out.append("[OK] Nenhum dado faltante encontrado em campos criticos!")
    return "\n".join(out)


_STATUS_SIMPLES = ["No-Show", "Realizado", "Cancelado"]


def _perfil_table(pdf: pd.DataFrame, coluna_grupo: str) -> pd.DataFrame:
    """Crosstab shape of one no-show profile (etl_pipeline.py:390-417)
    from already-pivoted (valor, No-Show, Realizado, Cancelado) rows —
    rendered exactly like the reference's pivot_table (index/columns
    names, int64 counts, 2dp rate)."""
    tabela = (
        pdf.set_index("valor")[_STATUS_SIMPLES].astype("int64").sort_index()
    )
    tabela.index.name = coluna_grupo
    tabela.columns.name = "Status_Simples"
    tabela["total"] = tabela[_STATUS_SIMPLES].sum(axis=1)
    # groups whose every row mapped to 'Outro' never appeared in the
    # reference's pre-filtered pivot — drop them, don't divide by 0
    tabela = tabela[tabela["total"] > 0]
    tabela["taxa_no_show_%"] = (tabela["No-Show"] / tabela["total"] * 100).round(2)
    return tabela


def relatorio_noshow(df_passado: DataFrame) -> str:
    """No-show headline + per-dimension profiles
    (etl_pipeline.py:363-430). ONE distributed job: the grouping-sets
    profile (operators.reshape.profile_union) computes every
    per-dimension status crosstab AND — via the grand-total grouping
    set — the headline scalars in a single Expand + aggregate pass;
    the driver only formats text. (The reference loops one groupby per
    dimension, :390-417.)"""
    from ..operators.reshape import profile_union

    st = F.col("Status_Consolidado")
    simples = reduce(
        lambda acc, kv: acc.when(st == kv[0], F.lit(kv[1])),
        _MAPA_STATUS.items(),
        F.when(F.lit(False), F.lit("")),
    ).otherwise(F.lit("Outro"))
    dims = [c for c, _ in _PROFILE_DIMS if c in df_passado.columns]
    aggs = [
        count_if(F.col("Status_Simples") == lbl).alias(lbl) for lbl in _STATUS_SIMPLES
    ] + [F.count(F.lit(1)).alias("_n_total")]
    if dims:
        prof = profile_union(
            df_passado.withColumn("Status_Simples", simples),
            dims,
            aggs,
            global_label="_GERAL_",
        ).toPandas()
        geral = prof[prof["dimensao"] == "_GERAL_"]
        total = int(geral["_n_total"].iloc[0]) if not geral.empty else 0
        noshows = int(geral["No-Show"].iloc[0]) if not geral.empty else 0
    else:
        prof = pd.DataFrame(columns=["dimensao", "valor", *_STATUS_SIMPLES, "_n_total"])
        head = df_passado.agg(
            F.count(F.lit(1)).alias("total"), count_if(st == "NO-SHOW").alias("noshows")
        ).first()
        total, noshows = head["total"], head["noshows"]
    if total == 0:
        return formatar_relatorio("1. Análise de No-Show", "Sem dados passados.")
    taxa = noshows / total * 100

    out = [_header("1. ANALISE DE NO-SHOW (GERAL)")]
    out.append(f"Taxa de No-Show Geral (%): {taxa:.2f}%")
    out.append(f"Total de Agendamentos Passados: {total}")
    out.append(f"Total de No-Shows: {noshows}")
    out.append("OBS: Agendas administrativas foram excluídas desta análise.")

    for coluna, titulo in _PROFILE_DIMS:
        rows = prof[prof["dimensao"] == coluna]
        if rows.empty:
            continue
        tabela = _perfil_table(rows, coluna)
        if tabela.empty:
            continue
        if titulo == "INDICACAO":
            tabela = tabela.sort_values("total", ascending=False)
        out.append(f"\n--- Perfil de No-Show por {titulo} ---")
        out.append(tabela.to_string())
    return "\n".join(out)


def relatorio_financeiro(df: DataFrame) -> str:
    """Revenue & ticket block (etl_pipeline.py:432-447): conditional
    sums in one pass, `R$ {:,.2f}` strings at the edge."""
    st = F.col("Status_Consolidado")
    v = F.col("Valor")
    r = df.agg(
        sum_if(v, st == "ATENDIDO").alias("realizada"),
        count_if(st == "ATENDIDO").alias("executados"),
        sum_if(v, st == "NO-SHOW").alias("perdida"),
    ).first()
    realizada = r["realizada"] or 0.0
    perdida = r["perdida"] or 0.0
    ticket = realizada / r["executados"] if r["executados"] else 0
    potencial = realizada + perdida
    taxa = realizada / potencial * 100 if potencial > 0 else 0
    return formatar_relatorio(
        "2 e 7. Financeiro (Receita e Ticket)",
        {
            "Ticket Médio (Realizado)": f"R$ {ticket:,.2f}",
            "Receita Realizada (ATENDIDO)": f"R$ {realizada:,.2f}",
            "Receita Perdida (NO-SHOW)": f"R$ {perdida:,.2f}",
            "Receita Potencial Total": f"R$ {potencial:,.2f}",
            "Taxa de Realização Financeira": f"{taxa:.2f}%",
        },
    )


def relatorio_antecedencia(df: DataFrame) -> str:
    """Mean booking lead time in days (etl_pipeline.py:449-454)."""
    if "Agendamento Inicio" not in df.columns or "Data_Marcacao" not in df.columns:
        return ""
    ant = (
        F.unix_timestamp("Agendamento Inicio") - F.unix_timestamp("Data_Marcacao")
    ) / 86400.0
    media = (
        df.na.drop(subset=["Agendamento Inicio", "Data_Marcacao"])
        .select(ant.alias("antecedencia"))
        .filter(F.col("antecedencia") >= 0)
        .agg(F.avg("antecedencia"))
        .first()[0]
    )
    if media is None:
        return formatar_relatorio("4. Antecedência", {"Média (Dias)": "nan"})
    return formatar_relatorio("4. Antecedência", {"Média (Dias)": f"{media:.2f}"})


def relatorio_atravessamento(df: DataFrame) -> str:
    """Mean journey / waiting minutes (etl_pipeline.py:456-459 region):
    averages over rows with the full attendance timestamp trio."""
    cols = [
        "Atendimentos_DataEHora_Chegada",
        "Atendimentos_DataEHora_Atendimento",
        "Atendimentos_DataEHora_Final",
    ]
    if not all(c in df.columns for c in cols):
        return ""
    base = df.filter(
        F.col("atendimentos_ok")
        & reduce(lambda a, c: a & F.col(c).isNotNull(), cols, F.lit(True))
    )
    mins = lambda a, b: (F.unix_timestamp(a) - F.unix_timestamp(b)) / 60.0  # noqa: E731
    r = base.agg(
        F.avg(mins(cols[2], cols[0])).alias("tempo_total"),
        F.avg(mins(cols[1], cols[0])).alias("espera"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    if r["n"] == 0:
        return ""
    return formatar_relatorio(
        "8. Jornada",
        {
            "Tempo Total Médio (Min)": f"{r['tempo_total']:.2f}",
            "Espera Média (Min)": f"{r['espera']:.2f}",
        },
    )


def gerar_relatorio_completo(df: DataFrame) -> str:
    """All five blocks in the reference `main()` print order
    (etl_pipeline.py:698-704). ``df`` is the preprocessed fact."""
    passado = df.filter(F.col("Status_Consolidado") != "AGENDADO")
    return "\n".join(
        s
        for s in (
            relatorio_dados_faltantes(df),
            relatorio_noshow(passado),
            relatorio_financeiro(df),
            relatorio_antecedencia(df),
            relatorio_atravessamento(df),
        )
        if s
    )

"""CLI entry (`python -m hubsit_health_analytics_etl_spark`) and the
formatted stdout reports (etl/relatorio.py), pinned against the same
crafted latin1 base as test_appointments_pipeline — expected values
hand-computed from those seven rows (r7 blacklisted away).

Past rows at as_of 2025-06-01: r1 ATENDIDO (R$1234.56), r2 NO-SHOW
(R$1234.56), r3 CANCELAMENTO_TARDIO, r4 CANCELADO, r6 ATENDIDO (R$0
unmatched price); r5 AGENDADO (future)."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

from tests.test_appointments_pipeline import AS_OF, HEADER, OCUP, PRICES, ROWS

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def fixture_files(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("cli")
    base = tmp / "base_anonima_final.csv"
    base.write_text(HEADER + "\n" + "\n".join(ROWS) + "\n", encoding="latin1")
    precos = tmp / "TabelaConvenio.txt"
    precos.write_text(PRICES, encoding="latin1")
    ocup = tmp / "OcupacaoAgenda.csv"
    ocup.write_text(OCUP, encoding="utf-8")
    return tmp, base, precos, ocup


@pytest.fixture(scope="module")
def fact(spark, fixture_files):
    from hubsit_health_analytics_etl_spark.etl.appointments import preprocess
    from hubsit_health_analytics_etl_spark.sources.csv_tolerant import (
        read_csv_tolerant,
    )

    _, base, precos, _ = fixture_files
    return preprocess(
        read_csv_tolerant(spark, str(base)),
        read_csv_tolerant(
            spark, str(precos),
            expected_cols=["Procedimento", "Convenio", "Valor_Convenio"],
        ),
        as_of=AS_OF,
        blacklist=("dr block",),
        parse_dates=True,
    )


def test_relatorio_financeiro_values(fact):
    """realizada=1234.56, executados=2 -> ticket 617.28; perdida
    (NO-SHOW)=1234.56 -> potencial 2469.12, taxa 50.00%."""
    from hubsit_health_analytics_etl_spark.etl.relatorio import relatorio_financeiro

    txt = relatorio_financeiro(fact)
    assert "--- 2 e 7. Financeiro (Receita e Ticket) ---" in txt
    assert "Ticket Médio (Realizado): R$ 617.28" in txt
    assert "Receita Realizada (ATENDIDO): R$ 1,234.56" in txt
    assert "Receita Perdida (NO-SHOW): R$ 1,234.56" in txt
    assert "Receita Potencial Total: R$ 2,469.12" in txt
    assert "Taxa de Realização Financeira: 50.00%" in txt


def test_relatorio_noshow_headline_and_profiles(fact):
    """5 past rows, 1 no-show -> 20.00%. By sexo: F (r1) 1 realizado;
    M (r2,r4,r6) no-show+cancelado+realizado -> taxa 33.33."""
    import pyspark.sql.functions as F

    from hubsit_health_analytics_etl_spark.etl.relatorio import relatorio_noshow

    txt = relatorio_noshow(fact.filter(F.col("Status_Consolidado") != "AGENDADO"))
    assert "1. ANALISE DE NO-SHOW (GERAL)" in txt
    assert "Taxa de No-Show Geral (%): 20.00%" in txt
    assert "Total de Agendamentos Passados: 5" in txt
    assert "Total de No-Shows: 1" in txt
    assert "--- Perfil de No-Show por SEXO ---" in txt
    assert "33.33" in txt
    assert "--- Perfil de No-Show por FAIXA ETARIA ---" in txt
    assert "--- Perfil de No-Show por INDICACAO ---" in txt
    # Indefinido never appears as a profile group value
    for line in txt.splitlines():
        assert not line.startswith("Indefinido")


def test_relatorio_noshow_golden_text(fact):
    """The single-pass (grouping-sets) rewrite must render EXACTLY the
    text the per-dimension-loop implementation produced on the crafted
    base — golden captured from that implementation (r6)."""
    import pyspark.sql.functions as F

    from hubsit_health_analytics_etl_spark.etl.relatorio import relatorio_noshow

    golden = open(os.path.join(REPO, "tests", "golden", "relatorio_noshow.txt")).read()
    txt = relatorio_noshow(fact.filter(F.col("Status_Consolidado") != "AGENDADO"))
    assert txt + "\n" == golden


def test_noshow_profile_is_single_pass(fact):
    """profile_union with the grand-total set must stay ONE Expand +
    ONE shuffle: headline and every dimension ride a single aggregate
    pass over the fact."""
    import pyspark.sql.functions as F

    from hubsit_health_analytics_etl_spark.operators.aggregate import count_if
    from hubsit_health_analytics_etl_spark.operators.reshape import profile_union
    from hubsit_health_analytics_etl_spark.plans.explain import physical_plan

    passado = fact.filter(F.col("Status_Consolidado") != "AGENDADO")
    prof = profile_union(
        passado,
        ["Pacientes_Sexo", "Faixa_Etaria", "Pacientes_Indicacao"],
        [count_if(F.col("Status_Consolidado") == "NO-SHOW").alias("No-Show"),
         F.count(F.lit(1)).alias("_n_total")],
        global_label="_GERAL_",
    )
    import re

    body = physical_plan(prof).split("== Physical Plan ==")[-1]
    # node-id entries ("(14) Expand") count each node once; the plain
    # "Exchange" token would double-count tree + detail lines and the
    # upstream price-join BroadcastExchange is not a shuffle
    assert len(re.findall(r"\(\d+\) Expand", body)) == 1
    assert len(re.findall(r"\(\d+\) Exchange\b", body)) == 1
    # the grand-total row is present alongside the per-dim rows
    labels = {r["dimensao"] for r in prof.select("dimensao").distinct().collect()}
    assert "_GERAL_" in labels


def test_relatorio_antecedencia_mean(fact):
    """Hand-computed lead times (days): 38.9583, 14.1667, 39.9583, 45,
    49, 19 -> mean 34.35."""
    from hubsit_health_analytics_etl_spark.etl.relatorio import relatorio_antecedencia

    txt = relatorio_antecedencia(fact)
    assert "--- 4. Antecedência ---" in txt
    assert "Média (Dias): 34.35" in txt


def test_relatorio_atravessamento_means(fact):
    """r1 (45 total / 15 wait) and r6 (40 / 10) -> 42.50 / 12.50."""
    from hubsit_health_analytics_etl_spark.etl.relatorio import (
        relatorio_atravessamento,
    )

    txt = relatorio_atravessamento(fact)
    assert "--- 8. Jornada ---" in txt
    assert "Tempo Total Médio (Min): 42.50" in txt
    assert "Espera Média (Min): 12.50" in txt


def test_relatorio_dados_faltantes(fact):
    """Cancellation timestamp present only on r3/r4 -> 4 of 6 missing;
    the alert line fires."""
    from hubsit_health_analytics_etl_spark.etl.relatorio import (
        relatorio_dados_faltantes,
    )

    txt = relatorio_dados_faltantes(fact)
    assert "ANALISE DE QUALIDADE DOS DADOS - DADOS FALTANTES" in txt
    assert "campos criticos possuem dados faltantes!" in txt
    row = next(
        l for l in txt.splitlines() if "Cancelamentos_DataDeCancelamento" in l
    )
    assert "4" in row.split() and "66.67" in row


def test_formatar_relatorio_frame():
    from hubsit_health_analytics_etl_spark.etl.relatorio import formatar_relatorio

    txt = formatar_relatorio("T", {"a": 1})
    assert txt == "\n--- T ---\na: 1\n\n-------\n"


def test_formatar_relatorio_golden_reference_bytes():
    """Golden pin of the frame contract against the reference's output
    (etl_pipeline.py:304-314 semantics, re-expressed): dict → 'k: v'
    lines in insertion order; plain string → verbatim body; footer
    dashes = len(titulo) + 6. Byte-exact, including the newline that
    separates body from footer."""
    from hubsit_health_analytics_etl_spark.etl.relatorio import formatar_relatorio

    multi = formatar_relatorio(
        "2 e 7. Financeiro (Receita e Ticket)",
        {"Ticket Médio (Realizado)": "R$ 1,234.50", "Taxa": "85.00%"},
    )
    assert multi == (
        "\n--- 2 e 7. Financeiro (Receita e Ticket) ---\n"
        "Ticket Médio (Realizado): R$ 1,234.50\n"
        "Taxa: 85.00%\n"
        "\n------------------------------------------\n"
    )
    plain = formatar_relatorio("1. Análise de No-Show", "Sem dados passados.")
    assert plain == (
        "\n--- 1. Análise de No-Show ---\n"
        "Sem dados passados."
        "\n---------------------------\n"
    )


def test_main_inprocess_writes_nine_outputs(spark, fixture_files, capsys):
    """Full main() path: reports printed, nine Parquet outputs + PBI
    CSV dirs written."""
    from hubsit_health_analytics_etl_spark.__main__ import main

    tmp, base, precos, ocup = fixture_files
    out = tmp / "out_inproc"
    rc = main(
        [
            str(base),
            str(precos),
            "-o",
            str(out),
            "--as-of",
            "2025-06-01T00:00:00",
            "--ocupacao",
            str(ocup),
            "--blacklist",
            "dr block",
        ]
    )
    assert rc == 0
    captured = capsys.readouterr().out
    assert "Taxa de No-Show Geral (%): 20.00%" in captured
    assert "[SUCESSO]" in captured
    names = {
        "base_tratada_completa", "agenda_comparecimento", "status_por_turno",
        "perfil_noshow", "financeiro", "atravessamento",
        "fluxo_pacientes_agregado", "indicadores_confirmacao",
        "qualidade_dados", "perfil_agenda",
    }
    for n in names:
        assert (out / f"{n}.parquet").exists(), n
        assert (out / f"{n}.csv_dir").exists(), n


def test_python_dash_m_subprocess(fixture_files):
    """The real `python -m hubsit_health_analytics_etl_spark` wiring:
    fresh interpreter, argv defaults contract, quiet + parquet-only."""
    tmp, base, precos, _ = fixture_files
    out = tmp / "out_subproc"
    r = subprocess.run(
        [
            sys.executable, "-m", "hubsit_health_analytics_etl_spark",
            str(base), str(precos), "-o", str(out),
            "--as-of", "2025-06-01T00:00:00",
            "--blacklist", "dr block", "--quiet", "--no-csv",
            "--master", "local[2]",
        ],
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "[SUCESSO]" in r.stdout
    assert (out / "financeiro.parquet").exists()
    assert not (out / "financeiro.csv_dir").exists()

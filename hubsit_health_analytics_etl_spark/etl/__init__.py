from .appointments import gerar_tabelas, preprocess, run_pipeline

__all__ = ["gerar_tabelas", "preprocess", "run_pipeline"]

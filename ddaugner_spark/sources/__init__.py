from .tables import load_table, TABLES
from .gazetteer import gazetteer_df
from .pages import synthesize_pages, extract_text

__all__ = ["load_table", "TABLES", "gazetteer_df", "synthesize_pages", "extract_text"]

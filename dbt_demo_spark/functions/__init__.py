from .numeric import round2, roundn, sql_round2, sql_roundn

__all__ = ["round2", "roundn", "sql_round2", "sql_roundn"]

from .numeric import (round2, roundn, scaled_long, sql_round2, sql_roundn,
                      sql_scaled_long)

__all__ = ["round2", "roundn", "scaled_long", "sql_round2", "sql_roundn",
           "sql_scaled_long"]

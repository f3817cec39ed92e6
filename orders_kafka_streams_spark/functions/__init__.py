from .portable import hash60, hash60_sql, epoch_ms

__all__ = ["hash60", "hash60_sql", "epoch_ms"]

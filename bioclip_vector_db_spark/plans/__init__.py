from .registry import QUERIES, ORACLES, register, load_all_plans

__all__ = ["QUERIES", "ORACLES", "register", "load_all_plans"]

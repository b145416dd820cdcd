from .numeric import cents, money_avg, money_sum  # noqa: F401

from .compat import rewrite_redshift_sql  # noqa: F401

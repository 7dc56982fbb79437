"""Spark operator stages. Each stage is a pure ``DataFrame -> DataFrame``
function; the full filter chain is assembled in ``plans.pipeline``."""

"""Physical planning helpers: strategy selection + plan-quality audit."""

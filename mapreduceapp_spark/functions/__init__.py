"""Reusable column-expression helpers (JVM-side, codegen-friendly)."""

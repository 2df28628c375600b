"""Scalar function library (SURVEY.md §2.7 F1-F20) — all pure Column
expressions (JVM-side, codegen-friendly); zero Python UDFs."""

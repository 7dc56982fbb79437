"""Logical pipeline assembly and the lifecycle runner."""

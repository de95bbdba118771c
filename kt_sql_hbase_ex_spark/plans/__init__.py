"""Plan inspection: pushdown / broadcast / codegen assertions."""

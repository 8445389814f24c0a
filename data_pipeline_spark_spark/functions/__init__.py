"""Column-expression helpers shared by operators."""

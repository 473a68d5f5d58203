"""2-D model zoo."""

"""3-D model zoo."""

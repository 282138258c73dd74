"""CLI application (reference layer L9: src/slam_app)."""

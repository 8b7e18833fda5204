"""Config, logging, and torch-checkpoint IO utilities."""

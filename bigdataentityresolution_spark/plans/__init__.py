"""Plans: staged pipeline orchestration + checkpoint/resume manifests."""

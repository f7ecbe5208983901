"""Input connectors: file/text/json readers with parse-status tracking."""

"""Connectors: Salesforce-shaped DataSource (Python DSv2) + mock transport."""

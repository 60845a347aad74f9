"""Training stack: SimOTA loss, optimizer schedule, EMA, data pipeline."""

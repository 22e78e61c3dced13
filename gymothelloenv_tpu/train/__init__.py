from gymothelloenv_tpu.train.tournament import play_games, tally  # noqa: F401

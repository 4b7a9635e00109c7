from .score import ScoreTrainState, ScoreTrainer, make_optimizer, make_score_train_step  # noqa: F401

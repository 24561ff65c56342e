"""Trainer factory (reference trainers/__init__.py:17-27 supports only
rq-vae; this framework also ships the stage-2 trainer)."""


def create_trainer(config):
    if config["arch"]["type"] == "rq-vae":
        from rqvae_tpu.trainers.loops import Stage1Trainer

        return Stage1Trainer
    elif config["arch"]["type"] == "rq-transformer":
        from rqvae_tpu.trainers.loops import Stage2Trainer

        return Stage2Trainer
    raise ValueError(f"{config['arch']['type']} is not supported")

from ktransformers_tpu.cli.main import cli

if __name__ == "__main__":
    cli()

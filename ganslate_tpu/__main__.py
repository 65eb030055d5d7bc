from ganslate_tpu.utils.cli.interface import interface

if __name__ == "__main__":
    interface()

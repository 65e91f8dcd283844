"""List registered tasks (reference src/mjlab/scripts/list_envs.py)."""


def main():
    import mjlab_tpu.tasks as tasks

    for name in tasks.list_tasks():
        print(name)


if __name__ == "__main__":
    main()

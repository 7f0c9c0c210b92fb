from jpeg_detection_resnet_ssd_tpu.cli.main import main

if __name__ == "__main__":
    main()

# Container deployment (reference roadmap "Containerized deployment",
# reference README.md:451-457).
#
# CPU image: the simulator runs anywhere via jax[cpu]; on TPU VMs install
# jax[tpu] instead (see docs/DEPLOY.md). The C++ Modbus data plane is
# built in-image so --native-modbus works out of the box.
#
#   docker build -t wt-sim-tpu .
#   docker run -p 5020:5020 -p 4840:4840 wt-sim-tpu        # the plant
#   docker run -p 5020:5020 -p 4840:4840 wt-sim-tpu --fleet 8   # a fleet
#   docker run --network host wt-sim-tpu-hmi               # see compose file

FROM python:3.12-slim

RUN apt-get update && apt-get install -y --no-install-recommends \
        g++ make && rm -rf /var/lib/apt/lists/*

WORKDIR /app
RUN pip install --no-cache-dir "jax[cpu]" numpy

COPY ics_wt_physicsengine_tpu/ ics_wt_physicsengine_tpu/
COPY native/ native/
COPY tools/ tools/
COPY pyproject.toml README.md ./

# build the C++ Modbus data plane
RUN make -C native

# Modbus/TCP + OPC UA (both planes serve one register store)
EXPOSE 5020 4840
ENTRYPOINT ["python", "-m", "ics_wt_physicsengine_tpu", \
            "--host", "0.0.0.0", "--port", "5020", "--opcua", "4840"]
CMD ["--rtf", "1", "--duration", "1000000000"]

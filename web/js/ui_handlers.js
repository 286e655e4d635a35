// Audio preview widgets for rvc_tpu nodes (counterpart of the reference's
// web/js/ui_handlers.js): attaches an <audio> element to nodes that return
// AUDIO previews.
import { app } from "../../scripts/app.js";
import { api } from "../../scripts/api.js";

function addPreviewWidget(node, audioUrl) {
    const existing = node.widgets?.find((w) => w.name === "rvc_audio_preview");
    if (existing) {
        existing.audioEl.src = audioUrl;
        return existing;
    }
    const el = document.createElement("audio");
    el.controls = true;
    el.src = audioUrl;
    el.style.width = "100%";
    const widget = node.addDOMWidget("rvc_audio_preview", "audio", el, {
        serialize: false,
    });
    widget.audioEl = el;
    node.setSize([node.size[0], node.computeSize()[1]]);
    return widget;
}

app.registerExtension({
    name: "rvc_tpu.audio_preview",
    async beforeRegisterNodeDef(nodeType, nodeData) {
        if (!nodeData.name?.startsWith("RVC_TPU_")) return;
        const onExecuted = nodeType.prototype.onExecuted;
        nodeType.prototype.onExecuted = function (message) {
            onExecuted?.apply(this, arguments);
            const preview = message?.preview?.[0];
            if (preview) {
                const url = api.apiURL(
                    `/view?filename=${encodeURIComponent(preview.filename)}` +
                    `&type=${preview.type || "output"}&subfolder=${preview.subfolder || ""}`
                );
                addPreviewWidget(this, url);
            }
        };
    },
});

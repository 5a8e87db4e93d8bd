#!/bin/sh
# Build a slim reference FFmpeg out-of-tree into /tmp/ffbuild for use as a
# test oracle (golden framecrc/framemd5 vectors) and CPU benchmark baseline.
# The reference tree at /root/reference is never written to.
set -e
mkdir -p /tmp/ffbuild
cd /tmp/ffbuild
test -f ffmpeg && exit 0
/root/reference/configure --prefix=/tmp/ffinstall --disable-x86asm --disable-doc \
 --disable-xlib --disable-libxcb --disable-vaapi --disable-vdpau \
 --disable-vulkan --disable-sdl2 --disable-iconv --disable-everything \
 --enable-protocol=file,pipe,fd,crypto,udp,tcp,rtp \
 --enable-demuxer=vvc,dts,mlp,truehd,mov,matroska,mpegts,wav,mjpeg,image2,rawvideo,yuv4mpegpipe,pcm_s16le,flac,aac,mp3,ogg,ivf,apng,image_png_pipe,image_jpeg_pipe,concat,avi,flv,gif,hls,h264,hevc,ac3,image_webp_pipe,rtsp,sdp,eac3,image_qoi_pipe,image_tiff_pipe,ass,srt,image_j2k_pipe \
 --enable-muxer=dts,mlp,truehd,pcm_f32le,mpeg1video,rawvideo,mov,mp4,matroska,mpegts,wav,mjpeg,image2,rawvideo,yuv4mpegpipe,framecrc,framemd5,md5,crc,null,pcm_s16le,flac,adts,ivf,apng,image2pipe,avi,mpeg2video,gif,ac3,ogg,dash,webm,rtp,rtsp,rtp_mpegts,eac3,ass,srt \
 --enable-encoder=dca,mlp,truehd,movtext,mjpeg,mpeg1video,mpeg2video,mpeg4,prores,dnxhd,ffv1,flac,aac,pcm_s16le,pcm_s16be,pcm_f32le,png,rawvideo,wrapped_avframe,ac3,msmpeg4v3,h263,gif,mp2,vorbis,opus,eac3,qoi,tiff,adpcm_ima_wav,adpcm_ms,ssa,subrip,jpeg2000 \
 --enable-indev=lavfi \
 --enable-decoder=vvc,dca,mlp,truehd,pgssub,movtext,wrapped_avframe,mjpeg,mpeg2video,mpeg4,prores,dnxhd,ffv1,flac,aac,pcm_s16le,pcm_s16be,pcm_f32le,png,rawvideo,h264,hevc,vp8,vp9,mpeg1video,mp3,vorbis,opus,ac3,msmpeg4v3,h263,gif,mp2,webp,eac3,qoi,tiff,adpcm_ima_wav,adpcm_ms,ssa,subrip,jpeg2000 \
 --enable-parser=vvc,dca,mlp,h264,hevc,mjpeg,mpegvideo,mpeg4video,aac,flac,mpegaudio,vp8,vp9,png,gif \
 --enable-bsf=h264_mp4toannexb,hevc_mp4toannexb,extract_extradata,null \
 --enable-filter=ebur128,loudnorm,atempo,afir,tonemap,zscale,colorspace,scale,aresample,testsrc,testsrc2,sine,color,anull,null,format,aformat,fps,crop,pad,psnr,ssim,anoisesrc,mandelbrot,volume,atrim,trim,setpts,asetpts,split,asplit,hflip,vflip,overlay,amix,transpose,negate,amerge,fillborders,colorbalance,colorchannelmixer,lutyuv,lutrgb,hstack,vstack,tile,extractplanes,shuffleplanes,dilation,erosion,median,sobel,prewitt,tpad,loop,reverse,setsar,setdar,chromakey,colorkey,limiter,maskedmerge,deflate,inflate,afade,apad,tremolo,vibrato,extrastereo,crystalizer,stereowiden,channelmap,join,channelsplit,pan,eq,hue,drawbox,boxblur,unsharp,fade,gblur,avgblur,edgedetect \
 --enable-ffprobe
make -j"$(nproc)"
